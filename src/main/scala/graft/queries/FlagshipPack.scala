package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryPack
import graft.pipeline.Flagship

/** The end-to-end glue-equivalent pipeline (SURVEY §3.1 / §7.3). */
object FlagshipPack extends QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flagship_refined" -> ((s, dir) => Flagship.refined(s, dir))
  )
  def oracleSql: Map[String, String] = Map(
    "flagship_refined" -> Flagship.refinedOracle
  )
}
