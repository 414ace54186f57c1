#!/bin/bash
# Run a command in the warm sbt tmux session and wait for completion.
# Usage: tools/sbtcmd.sh "<sbt command>" [timeout_sec]
set -u
CMD="$1"
TIMEOUT="${2:-480}"
MARK="__DONE_$(date +%s%N)__"
tmux clear-history -t sbt
tmux send-keys -t sbt "$CMD" Enter
# queue an eval that prints a unique marker after the command finishes
tmux send-keys -t sbt "eval println(\"$MARK\")" Enter
for i in $(seq 1 $((TIMEOUT / 2))); do
  if tmux capture-pane -t sbt -p -S -20000 | grep -q "^$MARK"; then
    break
  fi
  sleep 2
done
tmux capture-pane -t sbt -p -S -20000 | grep -v "^$MARK"
