package graft.decode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, DoubleType}

import graft.model.Model

/** O4 — typed decode / projection of an AttributeValue-encoded row image
  * (reference parseDynamoDBRecord, index.js:350-385).
  *
  * Pure Column projections: optional-chained field access becomes struct
  * navigation (null-safe by construction), parseInt/parseFloat-with-default
  * becomes cast + coalesce, and the embedded JSON array is parsed with
  * PERMISSIVE from_json (malformed → null → empty array), matching the
  * reference's "tolerate missing, default on absent" discipline. Everything
  * stays inside whole-stage codegen — no UDFs.
  */
object DynamoDecode {

  private def s(img: Column, field: String): Column =
    img.getField(field).getField("S")

  private def n(img: Column, field: String, t: String, default: Column): Column =
    coalesce(img.getField(field).getField("N").cast(t), default)

  private def b(img: Column, field: String): Column =
    img.getField(field).getField("BOOL")

  /** Decode one image struct into flat columns, each aliased
    * `{prefix}{name}`. Matches index.js:353-379 field-for-field. */
  def decodeImage(img: Column, prefix: String = ""): Seq[Column] = Seq(
    s(img, "eventId").as(prefix + "event_id"),
    s(img, "guestId").as(prefix + "guest_id"),
    s(img, "guest_name").as(prefix + "guest_name"),
    s(img, "guest_email").as(prefix + "guest_email"),
    s(img, "guest_phone").as(prefix + "guest_phone"),
    s(img, "email_status").as(prefix + "email_status"),
    b(img, "email_sent").as(prefix + "email_sent"),
    s(img, "whatsapp_status").as(prefix + "whatsapp_status"),
    b(img, "whatsapp_sent").as(prefix + "whatsapp_sent"),
    s(img, "guest_selfie_url").as(prefix + "guest_selfie_url"),
    s(img, "guest_registration_id").as(prefix + "guest_registration_id"),
    n(img, "total_matches", "int", lit(0)).as(prefix + "total_matches"),
    n(img, "new_matches", "int", lit(0)).as(prefix + "new_matches"),
    n(img, "best_similarity", "double", lit(0.0)).as(prefix + "best_similarity"),
    n(img, "average_similarity", "double", lit(0.0)).as(prefix + "average_similarity"),
    n(img, "profile_quality", "double", lit(0.0)).as(prefix + "profile_quality"),
    n(img, "overall_score", "double", lit(0.0)).as(prefix + "overall_score"),
    s(img, "delivery_status").as(prefix + "delivery_status"),
    s(img, "processed_at").as(prefix + "processed_at"),
    s(img, "created_at").as(prefix + "created_at"),
    s(img, "algorithm_version").as(prefix + "algorithm_version"),
    s(img, "update_mode").as(prefix + "update_mode"),
    coalesce(
      from_json(s(img, "matched_images"), ArrayType(Model.matchedImageSchema)),
      array().cast(ArrayType(Model.matchedImageSchema)))
      .as(prefix + "matched_images"),
    // JSON.parse is the one thing the reference's decode can throw on
    // (index.js:378-384): a present-but-malformed matched_images string.
    // PERMISSIVE from_json maps malformed → null, so null-out-of-non-null
    // is exactly the reference's throw condition.
    (s(img, "matched_images").isNotNull &&
      from_json(s(img, "matched_images"), ArrayType(Model.matchedImageSchema)).isNull)
      .as(prefix + "parse_error"),
    s(img, "match_statistics").as(prefix + "match_statistics"))

  /** Old-image fields needed by the CDC compare (O6): only the four the
    * reference reads from OldImage (index.js:191-212). */
  def decodeOldImage(img: Column): Seq[Column] = Seq(
    s(img, "email_status").as("old_email_status"),
    b(img, "email_sent").as("old_email_sent"),
    s(img, "delivery_status").as("old_delivery_status"),
    n(img, "total_matches", "int", lit(0)).as("old_total_matches"))
}
