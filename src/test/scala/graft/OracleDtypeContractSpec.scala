package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Dtype contract for every oracle SQL (VERDICT r9 #6): the driver compares
  * Spark and DuckDB results through pandas, whose representation cannot
  * faithfully hash three DuckDB type families — HUGEINT / DECIMAL(38,0)
  * (int128 coerces to float64, so `3` hashes as `3.0`), LIST (ndarray cells
  * break the driver's row-sort canonicalization), and STRUCT/MAP. Round 9
  * shipped 7 value-correct queries that failed the driver's gate on exactly
  * this; this spec type-checks every `SparkEntry.oracleSql` entry via DuckDB
  * `DESCRIBE` (binding only — nothing executes) so the class can never ship
  * again.
  *
  * Requires the dev-side python3+duckdb the check tooling already uses; if
  * that interpreter is absent the test is canceled (not silently passed).
  */
class OracleDtypeContractSpec extends AnyFunSuite {

  private def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("no oracle SQL surfaces a pandas-unhashable column type") {
    val hasDuck = try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: java.io.IOException => false }
    assume(hasDuck, "python3+duckdb unavailable — dtype contract not checkable here")

    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, json)

    val pb = new ProcessBuilder("python3", "tools/dtype_contract.py",
      "/root/testdata/sf0.001", tmp.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle dtype contract violated:\n$out")
  }
}
