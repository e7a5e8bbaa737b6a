package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rules.Rules

/** REMOVE-event (tombstone) handling — the designed extension for the
  * one event type the reference deliberately drops (index.js:146-153
  * skips REMOVE with "Event type REMOVE not relevant"). O2 faithfully
  * replicates that drop in the default pipeline; a general CDC engine
  * must also offer the delete path, so this module derives, from the
  * same decoded frame, the three downstream effects a deletion has:
  *
  *  1. a per-record DECISION (`tombstoned` / `tombstone_skipped`) with
  *     the same explainable-reason discipline as the O2..O10 cascade;
  *  2. a STATUS-TABLE tombstone — delivery_status 'deleted', merged
  *     through the same optimistic CAS the O8/O11 markers use
  *     ([[graft.sink.StatusStore.markDeleted]]), so deletes compose
  *     with concurrent triggers under the store's versioned protocol;
  *  3. a CORPUS EXCISION marker (doc_id, guest_email) for the ingest
  *     layers — the hook a right-to-be-forgotten sweep joins against.
  *
  * Key derivation: a real DynamoDB REMOVE carries the item's last
  * state in OldImage (and no NewImage); the fixture's REMOVE rows
  * carry NewImage. `coalesce(new, old)` serves both without a schema
  * switch — the reference's own "tolerate missing" discipline.
  * Everything is a pure Column projection over the decoded frame: no
  * UDFs, no shuffles beyond what the caller's plan already has.
  */
object Tombstones {

  /** Per-REMOVE decision frame: (record_id, event_id, guest_id,
    * guest_email, action, reason). Keys fall back new→old image;
    * emails are lowercased like every other probe (index.js:117). */
  def decisions(dec: DataFrame): DataFrame = {
    val eventId = coalesce(col("event_id"), col("old_event_id"))
    val guestId = coalesce(col("guest_id"), col("old_guest_id"))
    val email = coalesce(col("guest_email"), col("old_guest_email"))
    dec.filter(col("event_name") === "REMOVE")
      .select(
        col("record_id"),
        eventId.as("event_id"),
        guestId.as("guest_id"),
        Rules.asciiLower(email).as("guest_email"),
        when(eventId.isNotNull && guestId.isNotNull, "tombstoned")
          .otherwise("tombstone_skipped").as("action"),
        when(eventId.isNotNull && guestId.isNotNull,
          "Record deleted upstream - tombstone propagated")
          .otherwise("No key data on REMOVE image").as("reason"))
  }

  /** The status-table merge rows for applied tombstones — the
    * [[graft.sink.StatusStore.casMerge]] input shape (unconditional,
    * like the O8 duplicate marker: a delete wins over any in-flight
    * trigger state). */
  def statusUpdates(decisions: DataFrame): DataFrame =
    decisions.filter(col("action") === "tombstoned")
      .select(col("event_id"), col("guest_id"))
      .distinct()

  /** Corpus excision markers: the doc identity the ingest layers key
    * on (event-scoped guest doc) plus the lowercased email for
    * email-keyed state. Downstream: anti-join the corpus / status
    * frames against this to excise. */
  def excisionMarkers(decisions: DataFrame): DataFrame =
    decisions.filter(col("action") === "tombstoned")
      .select(
        concat(col("event_id"), lit("-"), col("guest_id")).as("doc_id"),
        col("guest_email"))
      .distinct()
}
