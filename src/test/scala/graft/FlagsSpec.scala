package graft

import graft.flags.{Ev, FlagRules}
import org.scalatest.funsuite.AnyFunSuite

/** Scenario tests for flag rules — synthetic per-user timelines checking
  * fire-vs-no-fire, mirroring the reference's scenario style
  * (`/root/reference/test_ab_flags.py:17-60`,
  * `data_pipeline/test_fifty_percent_flag.py:15-52`). */
class FlagsSpec extends AnyFunSuite {

  private val Hour = 3600L * 1000000L
  private val Day  = 24 * Hour
  private val asOf = 1000 * Day // arbitrary fixed clock

  private def ev(id: Long, tpe: String, ageUs: Long, value: Double = 10.0) =
    Ev(userId = 7L, eventId = id, eventType = tpe, us = asOf - ageUs, value = value)

  test("inactive_24h fires only when the last event is older than 24h") {
    val stale = Seq(ev(1, "view", 30 * Hour), ev(2, "click", 26 * Hour))
    val fresh = stale :+ ev(3, "view", 2 * Hour)
    val flags = FlagRules.evaluateAll(7L, stale, asOf)
    assert(flags.exists(_.flag_type == "inactive_24h"))
    assert(flags.find(_.flag_type == "inactive_24h").get.flag_data == "hours_since_last=26")
    assert(!FlagRules.evaluateAll(7L, fresh, asOf).exists(_.flag_type == "inactive_24h"))
  }

  test("power_user fires at >= 80 events inside 30d, ignores older events") {
    val recent = (1 to 80).map(i => ev(i.toLong, "view", i * Hour))
    val old = (1 to 80).map(i => ev(100 + i.toLong, "view", 31 * Day + i * Hour))
    assert(FlagRules.evaluateAll(7L, recent, asOf).exists(_.flag_type == "power_user"))
    assert(!FlagRules.evaluateAll(7L, recent.take(79), asOf).exists(_.flag_type == "power_user"))
    assert(!FlagRules.evaluateAll(7L, old, asOf).exists(_.flag_type == "power_user"))
  }

  test("big_spender sums purchases exactly in decimal cents") {
    // 0.1 + 0.2 style float traps: 8000 * 0.1 must be exactly 800.00
    val evs = (1 to 8000).map(i => ev(i.toLong, "purchase", (i % 700 + 1) * Hour, 0.1))
    val flag = FlagRules.evaluateAll(7L, evs, asOf).find(_.flag_type == "big_spender")
    assert(flag.isDefined)
    assert(flag.get.flag_data == "spend_30d_cents=80000")
    val under = (1 to 7999).map(i => ev(i.toLong, "purchase", (i % 700 + 1) * Hour, 0.1))
    assert(!FlagRules.evaluateAll(7L, under, asOf).exists(_.flag_type == "big_spender"))
  }

  test("error_prone needs both absolute count and 25% share") {
    val manyErrsHighShare = (1 to 10).map(i => ev(i.toLong, "error", i * Hour)) ++
      (1 to 30).map(i => ev(100 + i.toLong, "view", i * Hour))
    val manyErrsLowShare = (1 to 10).map(i => ev(i.toLong, "error", i * Hour)) ++
      (1 to 100).map(i => ev(100 + i.toLong, "view", (i % 700) * Hour))
    val fewErrs = (1 to 9).map(i => ev(i.toLong, "error", i * Hour))
    assert(FlagRules.evaluateAll(7L, manyErrsHighShare, asOf).exists(_.flag_type == "error_prone"))
    assert(!FlagRules.evaluateAll(7L, manyErrsLowShare, asOf).exists(_.flag_type == "error_prone"))
    assert(!FlagRules.evaluateAll(7L, fewErrs, asOf).exists(_.flag_type == "error_prone"))
  }

  test("streak_7d needs activity on all 7 trailing calendar days") {
    // asOf is midnight-aligned (1000 * Day), so day buckets are exact.
    val full = (1 to 7).map(i => ev(i.toLong, "view", i * Day - 12 * Hour))
    val gap = full.filterNot(_.eventId == 4)
    assert(FlagRules.evaluateAll(7L, full, asOf).exists(_.flag_type == "streak_7d"))
    assert(!FlagRules.evaluateAll(7L, gap, asOf).exists(_.flag_type == "streak_7d"))
  }

  test("night_owl needs volume and a 30% night share") {
    // 1000*Day is a midnight anchor: age h*Hour puts the event at hour 24-h.
    val night = (1 to 8).map(i => ev(i.toLong, "view", 23 * Hour + i)) // hour 0-1
    val day = (1 to 16).map(i => ev(100 + i.toLong, "view", 12 * Hour + i)) // hour 11-12
    assert(FlagRules.evaluateAll(7L, night ++ day, asOf).exists(_.flag_type == "night_owl"))
    assert(!FlagRules.evaluateAll(7L, night ++ day ++ day, asOf)
      .exists(_.flag_type == "night_owl")) // share drops to 20%
    assert(!FlagRules.evaluateAll(7L, night, asOf).exists(_.flag_type == "night_owl")) // < 20 events
  }

  test("weekend_warrior counts UTC Saturdays/Sundays by epoch-day arithmetic") {
    // day 1000 = (1000+4)%7 = 3 → Wednesday. Saturday is 3 days back.
    val sat = (1 to 8).map(i => ev(i.toLong, "view", 4 * Day - 12 * Hour + i))
    val wed = (1 to 13).map(i => ev(100 + i.toLong, "view", 12 * Hour + i))
    val flags = FlagRules.evaluateAll(7L, sat ++ wed, asOf)
    val f = flags.find(_.flag_type == "weekend_warrior")
    assert(f.isDefined && f.get.flag_data == "weekend_30d=8,total_30d=21")
    assert(!FlagRules.evaluateAll(7L, sat ++ wed ++ wed, asOf)
      .exists(_.flag_type == "weekend_warrior"))
  }

  test("rules are independent: one user can carry several flags") {
    val evs = (1 to 90).map(i => ev(i.toLong, "purchase", 25 * Hour + i, 10.0))
    val types = FlagRules.evaluateAll(7L, evs, asOf).map(_.flag_type).toSet
    assert(types.contains("inactive_24h"))
    assert(types.contains("power_user"))
    assert(types.contains("big_spender"))
  }
}
