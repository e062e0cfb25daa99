package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar interval arithmetic in pure integer day algebra — no session
  * calendars, no per-row UDF, identical on every engine.
  */
object DateArith {

  /** Business days (Mon–Fri) in the half-open interval [start, end),
    * negative when end < start. Closed form via the prefix function
    * f(d) = 5·⌊t/7⌋ + min(t mod 7, 5) with t = days since Monday
    * 1970-01-05: f counts business days from that Monday up to (not
    * including) d, so the interval count is f(end) − f(start). t ≥ 0 for
    * any modern date, so truncating and flooring division agree — the
    * formula replays exactly in ANSI SQL with `//`.
    */
  def businessDaysBetween(start: Column, end: Column): Column = {
    def f(d: Column): Column = {
      val t = datediff(d, lit("1970-01-05")).cast("long")
      // Column./ is double division; the pmod subtraction makes the
      // dividend an exact multiple of 7, so the double quotient is an
      // exact integer (≤ 2^49) and the cast is lossless.
      ((t - pmod(t, lit(7L))) / lit(7)).cast("long") * lit(5L) +
        least(pmod(t, lit(7L)), lit(5L))
    }
    (f(end) - f(start)).cast("long")
  }
}
