package graft.functions

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

class HolidaysSpec extends AnyFunSuite {

  test("Gregorian computus matches the published Easter dates") {
    // spot checks across computus regimes (epact edge cases included:
    // 1954 and 1981 are the classic h=29/l adjustments)
    val known = Map(
      1954 -> LocalDate.of(1954, 4, 18),
      1981 -> LocalDate.of(1981, 4, 19),
      2000 -> LocalDate.of(2000, 4, 23),
      2008 -> LocalDate.of(2008, 3, 23),
      2011 -> LocalDate.of(2011, 4, 24),
      2016 -> LocalDate.of(2016, 3, 27),
      2020 -> LocalDate.of(2020, 4, 12),
      2024 -> LocalDate.of(2024, 3, 31),
      2025 -> LocalDate.of(2025, 4, 20),
      2026 -> LocalDate.of(2026, 4, 5))
    known.foreach { case (y, want) =>
      assert(Holidays.easter(y) == want, s"easter($y)")
    }
  }

  test("movable feasts sit at their Easter offsets with the right weekdays") {
    for (y <- 1995 to 2026) {
      val e = Holidays.easter(y)
      assert(e.getDayOfWeek == java.time.DayOfWeek.SUNDAY, s"$y easter")
      val Seq(cm, ct, gf, cc) = Holidays.movableFeasts(y)
      assert(cm == e.minusDays(48) &&
        cm.getDayOfWeek == java.time.DayOfWeek.MONDAY, s"$y carnival mon")
      assert(ct == e.minusDays(47) &&
        ct.getDayOfWeek == java.time.DayOfWeek.TUESDAY, s"$y carnival tue")
      assert(gf == e.minusDays(2) &&
        gf.getDayOfWeek == java.time.DayOfWeek.FRIDAY, s"$y good friday")
      assert(cc == e.plusDays(60) &&
        cc.getDayOfWeek == java.time.DayOfWeek.THURSDAY, s"$y corpus christi")
    }
  }

  test("generated calendar: 12 holidays per year modulo collisions, sorted, sql lockstep") {
    // a movable feast can land ON a fixed date (Good Friday 2000 = Apr 21
    // = Tiradentes), so per-year the DISTINCT union is 12 or 11
    for (y <- 1995 to 2026) {
      val n = Holidays.forYear(y).distinct.size
      assert(n == 12 || n == 11, s"$y: $n")
    }
    assert(Holidays.forYear(2000).distinct.size == 11, "the 2000 collision")
    val expected = (1995 to 2026).flatMap(Holidays.forYear).distinct.size
    assert(Holidays.dates.size == expected)
    assert(Holidays.dates == Holidays.dates.sorted)
    assert(Holidays.dates.distinct.size == Holidays.dates.size)
    // the SQL literal list is the SAME generated set (oracle lockstep)
    assert(Holidays.sqlList.split(", ").length == Holidays.dates.size)
    assert(Holidays.sqlList.contains(s"DATE '${Holidays.easter(2020).minusDays(2)}'"))
  }
}
