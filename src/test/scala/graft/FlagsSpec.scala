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

  // ---- A/B-gated offer + persistent status (mirrors test_ab_flags.py:17-60) ----

  private val groupAUser = (0L to 50L).find(i => FlagRules.abDigit(i.toString) <= 4).get
  private val groupBUser = (0L to 50L).find(i => FlagRules.abDigit(i.toString) > 4).get

  private def evFor(uid: Long)(id: Long, tpe: String, ageUs: Long) =
    Ev(userId = uid, eventId = id, eventType = tpe, us = asOf - ageUs, value = 10.0)

  test("returning_offer_2wk: Group A with 2 recent purchases and fewer signups fires") {
    val e = evFor(groupAUser) _
    val evs = Seq(e(1, "purchase", 2 * Day), e(2, "purchase", 3 * Day), e(3, "signup", 4 * Day))
    val f = FlagRules.evaluateAll(groupAUser, evs, asOf).find(_.flag_type == "returning_offer_2wk")
    assert(f.isDefined && f.get.flag_data == "p7=2,s7=1")
  }

  test("returning_offer_2wk: Group B never fires on the same timeline") {
    val e = evFor(groupBUser) _
    val evs = Seq(e(1, "purchase", 2 * Day), e(2, "purchase", 3 * Day))
    assert(!FlagRules.evaluateAll(groupBUser, evs, asOf)
      .exists(_.flag_type == "returning_offer_2wk"))
  }

  test("returning_offer_2wk: one purchase, or signups >= purchases, is not enough") {
    val e = evFor(groupAUser) _
    val onePurchase = Seq(e(1, "purchase", 2 * Day))
    val memberish = Seq(e(1, "purchase", 2 * Day), e(2, "purchase", 3 * Day),
      e(3, "signup", 1 * Day), e(4, "signup", 4 * Day))
    val stale = Seq(e(1, "purchase", 8 * Day), e(2, "purchase", 9 * Day))
    assert(!FlagRules.evaluateAll(groupAUser, onePurchase, asOf)
      .exists(_.flag_type == "returning_offer_2wk"))
    assert(!FlagRules.evaluateAll(groupAUser, memberish, asOf)
      .exists(_.flag_type == "returning_offer_2wk"))
    assert(!FlagRules.evaluateAll(groupAUser, stale, asOf)
      .exists(_.flag_type == "returning_offer_2wk"))
  }

  test("active_member fires on a signup within 14d, not on an older one") {
    val fresh = Seq(ev(1, "signup", 13 * Day))
    val old = Seq(ev(1, "signup", 15 * Day))
    val f = FlagRules.evaluateAll(7L, fresh, asOf).find(_.flag_type == "active_member")
    assert(f.isDefined && f.get.flag_data == "signups_14d=1")
    assert(!FlagRules.evaluateAll(7L, old, asOf).exists(_.flag_type == "active_member"))
  }
}

/** Relational post-passes: child attribution/suppression, offer guards,
  * party-dim rules — synthetic frames pinning each fire/no-fire edge. */
class FlagPassesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.flags.{FlagPasses, PartyFlags}
  import org.apache.spark.sql.functions.col

  private def df(cols: String*)(rows: Product*) = {
    import org.apache.spark.sql.{Row, types => T}
    val schema = T.StructType(cols.map { c =>
      T.StructField(c,
        if (c.contains("flag") || c == "attending" || c == "priority") T.StringType
        else T.LongType)
    })
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(p => Row(p.productIterator.toSeq: _*)), 2),
      schema)
  }

  test("familyMap keeps minors whose decade-head parent exists in the universe") {
    val uni = df("user_id")(Tuple1(10L), Tuple1(18L), Tuple1(19L), Tuple1(38L), Tuple1(5L))
    val fam = FlagPasses.familyMap(uni).select("child_id", "parent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fam == Map(18L -> 10L, 19L -> 10L)) // 38's parent 30 missing; 5 not a minor
  }

  test("childPass prefixes eligible child flags and suppresses when the parent has the base flag") {
    val flags = df("user_id", "flag_type", "flag_data", "priority")(
      (18L, "power_user", "n_30d=90", "low"),   // child; parent 10 has it → suppressed
      (18L, "big_spender", "spend=1", "medium"),// child; parent lacks it → child_big_spender
      (18L, "inactive_24h", "h=30", "medium"),  // child but ineligible type → unchanged
      (10L, "power_user", "n_30d=85", "low"),   // the parent's own flag
      (5L, "big_spender", "spend=2", "medium")) // unrelated adult → unchanged
    val uni = df("user_id")(Tuple1(10L), Tuple1(18L), Tuple1(5L))
    val out = FlagPasses.childPass(flags, FlagPasses.familyMap(uni))
      .select("user_id", "flag_type", "parent_user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(
      (18L, "child_big_spender", 10L),
      (18L, "inactive_24h", -1L),
      (10L, "power_user", -1L),
      (5L, "big_spender", -1L)))
  }

  test("guardOffers annotates reflag_180d, sync_30d (independent of set age), and none") {
    val day = 86400000000L
    val asOf = 1000L * day
    val cur = df("user_id", "flag_type", "flag_data", "priority")(
      (1L, "returning_offer_2wk", "p7=2,s7=0", "high"),
      (2L, "returning_offer_2wk", "p7=3,s7=1", "high"),
      (3L, "returning_offer_2wk", "p7=2,s7=1", "high"))
    val sets = df("user_id", "flag_type", "set_us")(
      (1L, "returning_offer_2wk", asOf - 100 * day),   // set 100d ago → reflag
      (2L, "returning_offer_2wk", asOf - 200 * day))   // set 200d ago → past guard
    val syncs = df("user_id", "flag_type", "sync_us")(
      (2L, "returning_offer_2wk", asOf - 10 * day))    // re-synced 10d ago → cooldown
    val out = FlagPasses.guardOffers(cur, sets, syncs, asOf)
      .select("user_id", "suppressed_by").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "reflag_180d", 2L -> "sync_30d", 3L -> "none"))
  }

  test("party host/attendee rules fire on the exact day window, first party per user") {
    val day = 86400000000L
    val asOf = (PartyFlags.PartyBaseDay + 6) * day // party_day base+13 is 7 days out
    val orders = df("o_orderkey", "o_custkey")(
      (13L, 1L),   // day base+13 = asOf+7, host 1; 13%3=1 → attendee 2 (13+1)%4!=0 yes
      (27L, 1L),   // also asOf+7 (27%14=13), host 1 → min party_id 13 wins
      (12L, 4L),   // day base+12 = asOf+6, host 4; 12%3=0 → no rsvps
      (16L, 9L))   // day base+2: out of window
    val uni = df("user_id")(Tuple1(1L), Tuple1(2L), Tuple1(4L))
    val parties = PartyFlags.parties(orders)
    val rsvps = PartyFlags.rsvps(orders, uni)
    val host7 = PartyFlags.hostFlags(parties, uni, asOf, 7, "party_host_7d")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val host6 = PartyFlags.hostFlags(parties, uni, asOf, 6, "party_host_6d")
      .collect().map(r => r.getLong(0)).toSet
    val att7 = PartyFlags.attendeeFlags(parties, rsvps, asOf, 7, "party_attendee_7d")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(host7 == Set((1L,
      s"party_id=13,party_day=${PartyFlags.PartyBaseDay + 13},rsvp_yes=1,days_until=7")))
    assert(host6 == Set(4L))
    // attendee 2 RSVP'd yes to party 13 (party 27 has no RSVPs: 27%3=0)
    assert(att7 == Set((2L,
      s"party_id=13,party_day=${PartyFlags.PartyBaseDay + 13},days_until=7")))
  }
}
