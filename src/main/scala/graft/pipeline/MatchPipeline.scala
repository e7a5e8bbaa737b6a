package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.decode.DynamoDecode
import graft.rules.Rules

/** Batch assembly of the CDC match-notification pipeline: the reference's
  * operator chain O2..O15 (SURVEY.md §2.1) as composable DataFrame
  * transforms. Streaming assembly lives in graft.streaming.
  *
  * Scale posture: everything up to the dedup join is a pure projection /
  * filter chain (whole-stage codegen, no exchange). The dedup lookup (O7)
  * is the single shuffle: a distinct over the status keys and an equi-join
  * on (event_id, guest_email). Both sides hash-partition on the same keys,
  * and AQE broadcasts the (small, post-filter, post-distinct) status side
  * when it fits — at 100 TB the status table is still orders of magnitude
  * smaller than the stream batch because it holds only keys in a terminal
  * or in-flight status.
  */
object MatchPipeline {

  /** O4 on both images + envelope metadata → flat decoded frame. */
  def decoded(envelope: DataFrame): DataFrame = {
    val img = col("dynamodb").getField("NewImage")
    val old = col("dynamodb").getField("OldImage")
    envelope.select(
      Seq(
        col("eventID").as("record_id"),
        col("eventName").as("event_name"),
        img.isNotNull.as("has_new_image")) ++
        DynamoDecode.decodeImage(img) ++
        DynamoDecode.decodeOldImage(old): _*)
  }

  /** O7's right side — the keys currently visible as processing / delivered
    * / sent (the reference's FilterExpression, index.js:114). */
  def statusKeys(dec: DataFrame): DataFrame =
    dec.filter(
        col("delivery_status").isin("processing", "delivered") ||
          col("email_status") === "sent")
      .select(col("event_id"), col("guest_email"))
      .distinct()

  /** O7 — dedup lookup as an equi-join. The probe email is lowercased, the
    * stored one compared raw, exactly like the reference's
    * `guest_email = :email` with `:email = email.toLowerCase()`
    * (index.js:114-117) — the case-quirk is preserved deliberately. */
  def withDupHit(dec: DataFrame): DataFrame = {
    val st = statusKeys(dec)
      .withColumnRenamed("event_id", "s_event_id")
      .withColumnRenamed("guest_email", "s_guest_email")
      .withColumn("s_hit", lit(true))
    dec.join(st,
        col("event_id") === col("s_event_id") &&
          col("s_guest_email") === Rules.asciiLower(col("guest_email")),
        "left")
      .withColumn("dup_hit", coalesce(col("s_hit"), lit(false)))
      .drop("s_event_id", "s_guest_email", "s_hit")
  }

  /** Decode + dedup join + full rule cascade → decoded frame with
    * (action, reason) attached. The cascade is one struct-valued CaseWhen
    * evaluated behind a projection boundary — see Rules.decisionStruct. */
  def decide(envelope: DataFrame, minMatches: Int = 1): DataFrame = {
    val d = withDupHit(decoded(envelope))
    val decision = Rules.decisionStruct(
      eventName = col("event_name"),
      hasNewImage = col("has_new_image"),
      eventId = col("event_id"),
      guestId = col("guest_id"),
      guestName = col("guest_name"),
      guestEmail = col("guest_email"),
      emailStatus = col("email_status"),
      emailSent = col("email_sent"),
      deliveryStatus = col("delivery_status"),
      totalMatches = col("total_matches"),
      newMatches = col("new_matches"),
      oldEmailStatus = col("old_email_status"),
      oldEmailSent = col("old_email_sent"),
      oldDeliveryStatus = col("old_delivery_status"),
      oldTotalMatches = col("old_total_matches"),
      dupHit = col("dup_hit"),
      minMatches = minMatches)
    d.withColumn("decision", decision)
      .withColumn("action", col("decision").getField("action"))
      .withColumn("reason", col("decision").getField("reason"))
      .drop("decision")
  }

  /** Per-record outcome — the reference's handler result rows
    * (index.js:63-68, 148-315). Takes a decide()d frame so callers can
    * share one materialization across the sibling queries. */
  def actions(decided: DataFrame): DataFrame =
    decided.select(col("record_id"), col("action"), col("reason"))

  /** O13/O14 — enriched email jobs for the triggered records. */
  def emailJobs(decided: DataFrame): DataFrame =
    EmailJobs.enrich(decided.filter(col("action") === "email_triggered"))

  /** O13's top-K slice, exploded to one row per kept match. */
  def topMatches(decided: DataFrame): DataFrame =
    EmailJobs.topMatches(decided.filter(col("action") === "email_triggered"))

  /** O8 + O11 — the status writes the batch would issue: duplicates are
    * marked delivered (index.js:324-344), triggered records transition to
    * processing (index.js:448-497). */
  def statusUpdates(decided: DataFrame): DataFrame =
    decided
      .filter(col("action").isin("duplicate_prevented", "email_triggered"))
      .select(
        col("record_id"),
        col("event_id"),
        col("guest_id"),
        when(col("action") === "duplicate_prevented", "delivered")
          .otherwise("processing").as("new_delivery_status"),
        when(col("action") === "duplicate_prevented", "duplicate_detected_at")
          .otherwise("email_triggered_at").as("touch_field"))

  /** O15 — the per-batch metrics record (index.js:42-49). A single
    * partial+final aggregation; no keyed shuffle. Error records do not
    * count as processed (index.js:61-71). */
  def metrics(decided: DataFrame): DataFrame =
    decided.agg(
      count(lit(1)).as("total_records"),
      sum(when(col("action") =!= "error", 1L).otherwise(0L))
        .as("processed_records"),
      sum(when(col("action") === "email_triggered", 1L).otherwise(0L))
        .as("emails_triggered"),
      sum(when(col("action") === "skipped", 1L).otherwise(0L))
        .as("skipped_records"),
      sum(when(col("action") === "duplicate_prevented", 1L).otherwise(0L))
        .as("duplicates_prevented"),
      sum(when(col("action") === "error", 1L).otherwise(0L))
        .as("error_records"))
}
