package graft.flags

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational flag rules over scheduled-event dims (SURVEY.md §2.9 U1 —
  * the reference's birthday-party rules,
  * `/root/reference/data_pipeline/customer_flags_config.py:708-978`).
  *
  * The reference loads a parties CSV and an RSVPs CSV once, caches them as
  * class attributes, and has each per-customer rule evaluation probe them by
  * email with an exact date-window predicate (party_date == today + 7 or
  * + 6 days). That cached-dim-probed-per-row shape IS a broadcast join —
  * so these rules are declared relationally: dim × user-universe joins that
  * emit flag rows directly, unioned with the timeline rules' output. The
  * dims are dimension-table sized at any scale; the user side streams.
  *
  * Dim derivation on the synthetic star schema: every order is a booking —
  * party_id = o_orderkey, host = o_custkey (kept when the host is an events
  * user), scheduled on party_day = epochDay(2024-01-25) + o_orderkey % 14
  * (spans 2024-01-25..2024-02-07, bracketing the u1 evaluation clock).
  * RSVPs: order k invites users o_custkey+1 .. o_custkey+(k%3), attending
  * 'no' when (k+i)%4==0 else 'yes' — deterministic, so the DuckDB oracle
  * reconstructs the identical dims.
  */
object PartyFlags {

  /** epochDay(2024-01-25) — the first scheduled party day. */
  val PartyBaseDay = 19747L

  private val Day = 86400000000L

  /** The parties dim — ALL parties, like the reference's parties.csv
    * (restriction to evaluated users happens in the rules, where the
    * reference matches by email): (party_id, host_user, party_day,
    * rsvp_yes). rsvp_yes counts ALL yes-RSVPs of the party (a property of
    * the party, the reference's total_yes column — not just invitees who
    * happen to be known users). */
  def parties(orders: DataFrame): DataFrame = {
    val yes = rsvpsAll(orders)
      .filter(col("attending") === "yes")
      .groupBy(col("party_id").as("yp")).agg(count(lit(1)).as("n_yes"))
    orders.select(col("o_orderkey").as("party_id"), col("o_custkey").as("host_user"),
        (lit(PartyBaseDay) + col("o_orderkey") % 14).as("party_day"))
      .join(yes, col("party_id") === col("yp"), "left")
      .select(col("party_id"), col("host_user"), col("party_day"),
        coalesce(col("n_yes"), lit(0L)).as("rsvp_yes"))
  }

  /** Every RSVP of every party, before any universe restriction. */
  private def rsvpsAll(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 3 >= 1)
      .select(col("o_orderkey").as("party_id"), col("o_custkey").as("host"),
        explode(sequence(lit(1L), col("o_orderkey") % 3)).as("i"))
      .select(col("party_id"), (col("host") + col("i")).as("attendee_user"),
        when((col("party_id") + col("i")) % 4 === 0, lit("no"))
          .otherwise(lit("yes")).as("attending"))

  /** The RSVPs dim restricted to known users: (party_id, attendee_user,
    * attending). */
  def rsvps(orders: DataFrame, universe: DataFrame): DataFrame =
    rsvpsAll(orders)
      .join(universe.select(col("user_id").as("attendee_user")),
        Seq("attendee_user"), "left_semi")

  /** Hosts with a party exactly `daysOut` days after the evaluation clock —
    * `BirthdayPartyHostOneWeekOutFlag` (7) / `BirthdayPartyHostSixDaysOutFlag`
    * (6), `customer_flags_config.py:708-797,891-978`. One flag per host: the
    * reference takes `matches.iloc[0]`; the deterministic replacement is the
    * minimum party_id. */
  def hostFlags(parties: DataFrame, universe: DataFrame, asOfUs: Long,
      daysOut: Int, flagType: String): DataFrame = {
    // host reminders are high priority, like the reference's host rules
    val targetDay = asOfUs / Day + daysOut
    parties.filter(col("party_day") === targetDay)
      .join(universe.select(col("user_id").as("host_user")), Seq("host_user"), "left_semi")
      .groupBy(col("host_user").as("user_id"))
      .agg(min(col("party_id")).as("pid"),
        min_by(col("rsvp_yes"), col("party_id")).as("n_yes"))
      .select(col("user_id"), lit(flagType).as("flag_type"),
        concat(lit("party_id="), col("pid"), lit(",party_day="), lit(targetDay),
          lit(",rsvp_yes="), col("n_yes"), lit(",days_until="), lit(daysOut))
          .as("flag_data"),
        lit("high").as("priority"))
  }

  /** Users with a yes-RSVP to a party exactly `daysOut` days out —
    * `BirthdayPartyAttendeeOneWeekOutFlag`,
    * `customer_flags_config.py:801-887`. First matching party per attendee
    * (min party_id), like the host rules. */
  def attendeeFlags(parties: DataFrame, rsvps: DataFrame, asOfUs: Long,
      daysOut: Int, flagType: String): DataFrame = {
    val targetDay = asOfUs / Day + daysOut
    val due = parties.filter(col("party_day") === targetDay)
      .select(col("party_id"), col("party_day"))
    rsvps.filter(col("attending") === "yes")
      .join(broadcast(due), Seq("party_id"))
      .groupBy(col("attendee_user").as("user_id"))
      .agg(min(col("party_id")).as("pid"))
      .select(col("user_id"), lit(flagType).as("flag_type"),
        concat(lit("party_id="), col("pid"), lit(",party_day="), lit(targetDay),
          lit(",days_until="), lit(daysOut)).as("flag_data"),
        lit("medium").as("priority"))
  }
}
