package graft.flags

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational post-passes over a flags frame (user_id, flag_type,
  * flag_data, priority).
  *
  * The reference runs these as driver-side dict/set passes after rule
  * evaluation (`/root/reference/data_pipeline/customer_flags_engine.py:
  * 180-318`): child-flag attribution via the family graph, then suppression
  * of a child's flag when the parent triggered the same base flag. Here both
  * are joins — the family map is a dim (broadcast-sized), parent-own flags
  * are an anti-join key set — so the pass scales with the flags frame, not
  * with driver memory.
  */
object FlagPasses {

  /** Flag types that get a child_ prefix when raised by a minor — mirrors
    * `CHILD_ELIGIBLE_FLAGS` (`customer_flags_config.py:1921-1932`):
    * activity flags are eligible; ops/status flags (inactive_24h,
    * error_prone) and persistent billing status (active_member) are not. */
  val childEligible: Seq[String] =
    Seq("power_user", "big_spender", "streak_7d", "night_owl",
      "weekend_warrior", "returning_offer_2wk")

  /** The family dim derived from the user universe: users with id % 10 >= 8
    * are minors whose parent is the decade head (id - id % 10), kept only
    * when the parent exists in the universe — the analogue of
    * `customer_master_v2`'s parent_customer_id column
    * (`customer_flags_engine.py:35-101`). Returns (child_id, parent_id). */
  def familyMap(universe: DataFrame): DataFrame = {
    val u = universe.select(col("user_id")).distinct()
    u.filter(col("user_id") % 10 >= 8)
      .select(col("user_id").as("child_id"),
        (col("user_id") - col("user_id") % 10).as("parent_id"))
      .join(u.select(col("user_id").as("parent_id")), Seq("parent_id"), "left_semi")
  }

  /** Child attribution + parent suppression
    * (`customer_flags_engine.py:184-205` prefixing, `:276-312` suppression):
    * a minor's child-eligible flag becomes `child_<base>` carrying
    * parent_user_id; it is then dropped if the parent raised the same base
    * flag themselves (the parent already gets their own email). Non-child
    * and ineligible flags pass through with a null parent_user_id. */
  def childPass(flags: DataFrame, family: DataFrame): DataFrame = {
    val fam = broadcast(family)
    val tagged = flags.join(fam, flags("user_id") === fam("child_id"), "left")
      .withColumn("is_child_flag",
        col("child_id").isNotNull && col("flag_type").isin(childEligible: _*))
    // parents' own flags: every flag of a user who is not a minor
    val parentOwn = flags
      .join(fam.select(col("child_id")), flags("user_id") === col("child_id"), "left_anti")
      .select(col("user_id").as("po_user"), col("flag_type").as("po_flag"))
    tagged.join(parentOwn,
        col("is_child_flag") && col("parent_id") === col("po_user") &&
          col("flag_type") === col("po_flag"), "left_anti")
      .select(col("user_id"),
        when(col("is_child_flag"), concat(lit("child_"), col("flag_type")))
          .otherwise(col("flag_type")).as("flag_type"),
        col("flag_data"), col("priority"),
        when(col("is_child_flag"), col("parent_id")).as("parent_user_id"))
  }

  /** Prior-state guards for offer flags (`customer_flags_config.py:327-356`):
    * annotate each current-run offer with why it would be suppressed —
    * `reflag_180d` if the same flag was SET for the user within 180 days
    * (the reference's flag_set lookback), else `sync_30d` if it was SYNCED
    * downstream within 30 days (flag_synced_to_shopify — independent of the
    * set time, since syncs recur 3x/day), else `none`. Annotated rather
    * than dropped so the emission decision stays queryable;
    * `filter(suppressed_by = 'none')` is the reference's behavior.
    *
    * `priorSets`: (user_id, flag_type, set_us); `priorSyncs`: (user_id,
    * flag_type, sync_us) — both keep only their newest row per key here, so
    * callers pass raw history. Broadcast: prior offer state is flag-count
    * sized, never corpus sized. */
  def guardOffers(current: DataFrame, priorSets: DataFrame,
      priorSyncs: DataFrame, asOfUs: Long): DataFrame = {
    val day = 86400000000L
    val sets = broadcast(priorSets.groupBy(col("user_id").as("su"), col("flag_type").as("sf"))
      .agg(max(col("set_us")).as("last_set_us")))
    val syncs = broadcast(priorSyncs.groupBy(col("user_id").as("yu"), col("flag_type").as("yf"))
      .agg(max(col("sync_us")).as("last_sync_us")))
    current
      .join(sets, col("user_id") === col("su") && col("flag_type") === col("sf"), "left")
      .join(syncs, col("user_id") === col("yu") && col("flag_type") === col("yf"), "left")
      .withColumn("suppressed_by",
        when(col("last_set_us") >= lit(asOfUs - 180 * day), lit("reflag_180d"))
        .when(col("last_sync_us") >= lit(asOfUs - 30 * day), lit("sync_30d"))
        .otherwise(lit("none")))
      .drop("su", "sf", "yu", "yf", "last_set_us", "last_sync_us")
  }
}
