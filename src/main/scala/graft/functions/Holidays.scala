package graft.functions

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Holiday-calendar lookup (SURVEY §2.7 F6 / §2.9).
  *
  * The reference checks `date in holidays.BR()` per row
  * (/root/reference/src/data/preprocessing.py:186-189). Engine choice: a
  * small fixed calendar as a literal `isin` set — Catalyst compiles it to
  * an `InSet` over the broadcast literal array, fully codegen'd; no UDF,
  * no join. At 100 TB a holiday calendar is O(100) values/decade — always
  * a driver-side literal, never a shuffle.
  *
  * The calendar itself: fixed-date Brazilian national holidays (the
  * moveable feasts would come from an external table; fixed set suffices
  * for the operator demonstration) over the fixture date range.
  */
object Holidays {

  private val monthDays = Seq(
    (1, 1),   // Confraternização Universal
    (4, 21),  // Tiradentes
    (5, 1),   // Dia do Trabalho
    (9, 7),   // Independência
    (10, 12), // Nossa Senhora Aparecida
    (11, 2),  // Finados
    (11, 15), // Proclamação da República
    (12, 25)  // Natal
  )

  /** All fixed holidays across the fixture year span. */
  val dates: Seq[LocalDate] =
    for {
      y <- 1995 to 2026
      (m, d) <- monthDays
    } yield LocalDate.of(y, m, d)

  /** Column predicate: is the (date-typed) column a holiday? */
  def isHoliday(c: Column): Column =
    c.isin(dates.map(d => java.sql.Date.valueOf(d)): _*)

  /** The same set as a DuckDB SQL literal list. */
  val sqlList: String = dates.map(d => s"DATE '$d'").mkString(", ")
}
