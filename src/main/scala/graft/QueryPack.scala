package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of oracle-checked queries contributed by one module.
  *
  * `queries` maps name → (spark, sfDir) → result frame; `oracleSql` maps the
  * same name → equivalent DuckDB ANSI SQL over the fixture tables. Names
  * without oracle SQL get the driver's weaker rows-only check (used for
  * non-SQL-expressible ops: EWM, interpolation, LSH, …).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  /** Pre-populate any per-dataset verification state (the Fingerprint-
    * memoized ground-truth scans behind the invariant-frame queries) so a
    * timed run measures the operator, not its checker. Benchmarks call
    * this during warm-up; correctness runs may skip it — the memo then
    * fills lazily on first use with identical results. */
  def warm(spark: SparkSession, sfDir: String): Unit = ()
}
