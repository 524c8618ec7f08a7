package graft.ops

import java.sql.Date
import java.time.LocalDate

/** Lenient MEDLINE date assembly: `Year Month Day` parts where Month may
  * be numeric, a 3-letter or full English month name, and parts default
  * to `1800 Jan 1` (reference main.py:243-252, 363-377 — the dateutil
  * `parse(' '.join(...))` behavior for the formats MEDLINE uses).
  */
object MedlineDates {
  private val monthNames = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5,
    "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10,
    "nov" -> 11, "dec" -> 12)

  def month(s: String): Option[Int] = {
    val t = s.trim.toLowerCase
    if (t.forall(_.isDigit) && t.nonEmpty) {
      val m = t.toInt
      if (m >= 1 && m <= 12) Some(m) else None
    } else monthNames.get(t.take(3))
  }

  /** Parse (year, month, day) strings to a date; None when unparseable
    * (matching the reference's silent `pass` on ValueError). MEDLINE
    * season/range values ("Spring", "Jan-Feb") take the first month. */
  def parse(year: String, monthStr: String, day: String): Option[Date] = {
    val y = year.trim
    if (!y.forall(_.isDigit) || y.isEmpty) return None
    val mRaw = monthStr.trim.takeWhile(c => c != '-' && c != '/')
    val m = month(mRaw).getOrElse(
      mRaw.toLowerCase match { // seasons → first month of the season
        case "spring" => 4
        case "summer" => 7
        case "fall" | "autumn" => 10
        case "winter" => 1
        case _ => return None
      })
    val d = day.trim
    val dayNum = if (d.forall(_.isDigit) && d.nonEmpty) d.toInt else 1
    try Some(Date.valueOf(LocalDate.of(y.toInt, m, dayNum)))
    catch { case _: java.time.DateTimeException => None }
  }
}
