package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.{QueryPack, Tables}

/** Typed `Dataset[T]` surface (SURVEY §1.1: "Dataset[T] with case-class
  * Encoders where type safety helps"): the same relational semantics
  * through compile-time-checked field access. Typed filters/maps become
  * deserialize→lambda→serialize stages (outside codegen), so the engine
  * reserves them for business logic that benefits from the type checks —
  * here they are demonstrated and oracle-checked against the SQL answer.
  */
object TypedPack extends QueryPack {

  case class Lineitem(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_returnflag: String)
  case class FlagStats(l_returnflag: String, n: Long, qty: Double)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ty1_typed_pipeline" -> ((s, dir) => {
      import s.implicits._
      val ds: Dataset[Lineitem] = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
        .as[Lineitem]
      ds.filter(_.l_quantity > 45)
        .groupByKey(_.l_returnflag)
        .mapGroups { (flag, rows) =>
          var n = 0L
          var qty = 0.0
          rows.foreach { r => n += 1; qty += r.l_quantity } // integer-valued → exact
          FlagStats(flag, n, qty)
        }
        .toDF()
    })
  )

  def oracleSql: Map[String, String] = Map(
    "ty1_typed_pipeline" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem WHERE l_quantity > 45
        |GROUP BY l_returnflag""".stripMargin
  )
}
