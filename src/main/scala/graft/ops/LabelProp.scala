package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007), deterministic
  * variant: labels start as node ids; each round every node adopts the
  * most frequent label among its neighbors, ties broken toward the
  * SMALLEST label; all nodes update from the PREVIOUS round's labels
  * (synchronous — the only reproducible schedule for a distributed
  * engine; the stock algorithm's random visit order isn't).
  *
  * Scale shape (the g1 PageRank discipline): the symmetric edge list is
  * iteration-invariant and cached once outside the loop; each round is
  * one (dst, lab) count shuffle plus one per-node argmax — the argmax is
  * a max(struct(count, −label)) partial agg, so a hub's votes collapse
  * map-side and no window/sort ever runs. O(rounds·|E|) messages total.
  */
object LabelProp {

  /** Run `rounds` synchronous rounds over a SYMMETRIC (src, dst) edge
    * list. Returns (node, community). Isolated nodes (absent from
    * `edges`) are not emitted — they'd keep their own label forever. */
  def run(spark: SparkSession, edges0: DataFrame, rounds: Int): DataFrame = {
    val edges = edges0.select(col("src"), col("dst"))
      .cache() // iteration-invariant; lifetime left to Spark's LRU
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to rounds) {
      labels = edges
        .join(labels, edges("src") === labels("node"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("lab"))
    }
    labels.select(col("node"), col("lab").as("community"))
  }
}
