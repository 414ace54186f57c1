package graft.sources

import graft.{SparkSuite, SparkEntry}

/** s11's oracle proves content identity; this pins the part the hashes
  * can't see — the file count actually collapsed to the bytes/target
  * arithmetic, which is the entire point of a compaction pass. */
class CompactionSpec extends SparkSuite {

  private def partFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles())
      .map(_.count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")))
      .getOrElse(0)

  test("compaction collapses the fragmented table to the computed file count") {
    val n = SparkEntry.queries("s11_compaction")(spark, sf).count()
    assert(n > 0)
    val frag = partFiles("/tmp/graft_sinks/s11_frag")
    val compact = partFiles("/tmp/graft_sinks/s11_compact")
    assert(frag === 64, s"fragmented input must be 64-way, got $frag")
    // fixture bytes ≪ one target file ⇒ the arithmetic must yield 1 file
    assert(compact >= 1 && compact < frag,
      s"compaction must reduce file count: $frag -> $compact")
    assert(compact === 1,
      s"at fixture scale the byte-derived target is one file, got $compact")
  }
}
