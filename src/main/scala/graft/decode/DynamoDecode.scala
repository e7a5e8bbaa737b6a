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

  /** Old-image fields needed by the CDC compare (O6): the four the
    * reference reads from OldImage (index.js:191-212), plus the key
    * triple the r19 tombstone extension falls back to (a real
    * DynamoDB REMOVE carries only OldImage —
    * [[graft.pipeline.Tombstones]]). */
  def decodeOldImage(img: Column): Seq[Column] = Seq(
    s(img, "email_status").as("old_email_status"),
    b(img, "email_sent").as("old_email_sent"),
    s(img, "delivery_status").as("old_delivery_status"),
    n(img, "total_matches", "int", lit(0)).as("old_total_matches"),
    s(img, "eventId").as("old_event_id"),
    s(img, "guestId").as("old_guest_id"),
    s(img, "guest_email").as("old_guest_email"))

  // ------------------------------------------------------------------
  // Full AttributeValue type surface (the r18 "missing #1" extension).
  //
  // The reference reads exactly three tags — S, N, BOOL (+ an
  // embedded-JSON re-parse, index.js:350-385) — but the standard
  // DynamoDB wire format carries nine: S, N, BOOL, NULL, B, SS, NS,
  // BS, L, M. The first schema evolution a real CDC user makes (a
  // native list, map, set, binary, or typed NULL) needs a decode
  // path, so the per-tag combinators below generalize the private
  // s()/n()/b() helpers into a public composable surface. Everything
  // stays a pure built-in Column expression (getField / cast /
  // unbase64 / transform / transform_values), i.e. inside
  // whole-stage codegen, and null-safe by construction: an absent
  // attribute (null struct) flows a null through every combinator,
  // exactly the reference's optional-chained "tolerate missing"
  // discipline. Recursion (L of M of N, …) composes by nesting the
  // combinators — Spark needs a static schema, so the caller declares
  // the shape to the depth their table actually uses (the idiomatic
  // Spark answer to a dynamically-recursive wire type).
  // ------------------------------------------------------------------

  /** True iff the attribute is a typed DynamoDB NULL ({"NULL": true});
    * false for present values AND for absent attributes — callers that
    * need absent-vs-null distinguish with `av.isNull`. */
  def avIsNull(av: Column): Column =
    coalesce(av.getField("NULL"), lit(false))

  /** S — string. */
  def avString(av: Column): Column = av.getField("S")

  /** N — number-as-string, cast to the caller's numeric type
    * (DynamoDB numbers are arbitrary-precision decimal on the wire;
    * the table owner knows the real type). */
  def avNumber(av: Column, t: String): Column =
    av.getField("N").cast(t)

  /** N with the reference's parseInt/parseFloat-with-default shape. */
  def avNumber(av: Column, t: String, default: Column): Column =
    coalesce(av.getField("N").cast(t), default)

  /** BOOL. */
  def avBool(av: Column): Column = av.getField("BOOL")

  /** B — binary, base64-encoded on the wire → BinaryType. */
  def avBinary(av: Column): Column = unbase64(av.getField("B"))

  /** SS — string set → ArrayType(StringType). DynamoDB sets are
    * unordered; order-sensitive consumers should sort
    * (`array_sort`) before comparing. */
  def avStringSet(av: Column): Column = av.getField("SS")

  /** NS — number set → ArrayType of the caller's numeric type. */
  def avNumberSet(av: Column, t: String): Column =
    transform(av.getField("NS"), _.cast(t))

  /** BS — binary set → ArrayType(BinaryType). */
  def avBinarySet(av: Column): Column =
    transform(av.getField("BS"), e => unbase64(e))

  /** L — list; `elem` decodes each element AttributeValue (nest
    * combinators for deeper shapes). */
  def avList(av: Column)(elem: Column => Column): Column =
    transform(av.getField("L"), elem)

  /** M — map with homogeneous values; `value` decodes each value
    * AttributeValue. */
  def avMap(av: Column)(value: Column => Column): Column =
    transform_values(av.getField("M"), (_, v) => value(v))

  /** One value of an M map by key (for heterogeneous maps, where each
    * key's value decodes differently) — returns the raw
    * AttributeValue struct for a tag combinator to finish. */
  def avMapValue(av: Column, key: String): Column =
    element_at(av.getField("M"), key)

  /** Demo/oracle projection over [[graft.pipeline.MatchFixture
    * .attrItems]]: decodes every one of the nine standard tags
    * (including an L-of-M-of-N nesting) into flat typed columns that
    * an independent ANSI-SQL oracle reproduces from the same base
    * arithmetic — the hash gate for the full type surface. */
  def decodeAttrItems(items: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val it = col("item")
    items.select(
      col("rid"),
      // absent attribute (null struct) → reference-style default
      coalesce(avString(it.getField("name")), lit("absent")).as("name_s"),
      avNumber(it.getField("age"), "int", lit(0)).as("age_n"),
      coalesce(avBool(it.getField("vip")), lit(false)).as("vip_b"),
      avIsNull(it.getField("note")).as("note_isnull"),
      md5(avBinary(it.getField("avatar"))).as("avatar_md5"),
      length(avBinary(it.getField("avatar"))).cast("int").as("avatar_len"),
      array_join(array_sort(avStringSet(it.getField("tags"))), ",")
        .as("tags_cat"),
      aggregate(avNumberSet(it.getField("scores"), "int"),
        lit(0), (acc, x) => acc + x).as("scores_sum"),
      md5(concat(
        element_at(avBinarySet(it.getField("blobs")), 1),
        element_at(avBinarySet(it.getField("blobs")), 2))).as("blobs_md5"),
      size(avList(it.getField("gallery"))(avString)).as("gallery_n"),
      // try_element_at: ANSI-safe on the empty-list rows (element_at
      // throws INVALID_ARRAY_INDEX under ANSI mode)
      coalesce(try_element_at(
        avList(it.getField("gallery"))(avString), lit(1)), lit("none"))
        .as("gallery_first"),
      // heterogeneous M: each key finishes with its own tag combinator
      avString(avMapValue(it.getField("profile"), "city")).as("city_s"),
      avNumber(avMapValue(it.getField("profile"), "zip"), "int", lit(0))
        .as("zip_n"),
      // recursion: L of M of N — nested combinators, still one
      // codegen'd expression tree
      aggregate(
        avList(it.getField("nested"))(e =>
          avNumber(avMapValue(e, "v"), "int", lit(0))),
        lit(0), (acc, x) => acc + x).as("nested_sum"))
  }
}
