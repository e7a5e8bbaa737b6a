package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Model

/** Deterministic derivation of a DynamoDB-Streams-shaped envelope table
  * (FIXTURES.md §1) from the driver-provided `customer` table.
  *
  * Every field is pure integer/string arithmetic on `c_custkey`, so an
  * independent ANSI-SQL formulation (graft.oracle.OracleSql.fixtureCte)
  * reproduces the exact same values in DuckDB — this is what makes the
  * whole CDC pipeline (decode → filters → dedup join → rules → enrich)
  * hash-checkable against the driver's oracle without shipping any
  * synthetic data of our own.
  *
  * The derivation deliberately covers every outcome path of the reference
  * (index.js:148-315): REMOVE events, missing NewImage, already-sent /
  * delivered flags, MODIFY old-image rules, pool-expansion updates,
  * duplicate lookups, each validation failure, threshold misses, and the
  * deny-listed addresses.
  */
object MatchFixture {

  private def avS(c: Column): Column = struct(c.cast("string").as("S"))
  private def avN(c: Column): Column = struct(c.cast("string").as("N"))
  private def avB(c: Column): Column = struct(c.cast("boolean").as("BOOL"))

  /** Full-AttributeValue fixture (r19): one `item` per customer
    * carrying EVERY standard DynamoDB tag — S, N, BOOL, NULL, B, SS,
    * NS, BS, L, M, plus an L-of-M-of-N nesting — again pure integer/
    * string arithmetic on `c_custkey` so the DuckDB oracle
    * ([[graft.oracle.OracleSql.pipeDecodeAttrs]]) reproduces the
    * decoded values without modeling the wire format at all: if
    * [[graft.decode.DynamoDecode.decodeAttrItems]] mis-decodes any
    * tag, the hashes diverge. Absence discipline mirrors the envelope
    * fixture: `name` is a null struct on k%9==4 rows (absent
    * attribute), `note` is a typed NULL on k%7==2 rows. */
  def attrItems(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    def av(tag: String, c: Column): Column = struct(c.as(tag))
    val nGallery = (k % 4).cast("int")
    val item = struct(
      when(k % 9 =!= 4,
        av("S", concat(lit("guest "), (k % 50).cast("string"))))
        .as("name"),
      av("N", (k % 60 + 18).cast("string")).as("age"),
      av("BOOL", k % 3 === 0).as("vip"),
      when(k % 7 === 2, av("NULL", lit(true))).as("note"),
      av("B", base64(concat(lit("av"), k.cast("string")).cast("binary")))
        .as("avatar"),
      av("SS", array(
        concat(lit("t"), (k % 5).cast("string")),
        concat(lit("u"), (k % 7).cast("string")))).as("tags"),
      av("NS", array((k % 10).cast("string"), (k % 13).cast("string"),
        (k % 17).cast("string"))).as("scores"),
      av("BS", array(
        base64(concat(lit("p"), k.cast("string")).cast("binary")),
        base64(concat(lit("q"), k.cast("string")).cast("binary"))))
        .as("blobs"),
      av("L", when(nGallery >= 1,
        transform(sequence(lit(1), nGallery), i => struct(
          concat(lit("g/"), k.cast("string"), lit("/"),
            i.cast("string")).as("S"))))
        .otherwise(array().cast("array<struct<S:string>>"))).as("gallery"),
      av("M", map(
        lit("city"), struct(
          concat(lit("c"), (k % 20).cast("string")).as("S"),
          lit(null).cast("string").as("N")),
        lit("zip"), struct(
          lit(null).cast("string").as("S"),
          (k % 100 + 10000).cast("string").as("N")))).as("profile"),
      av("L", transform(sequence(lit(1), lit(2)), i => struct(
        map(lit("v"), struct(
          ((k * i) % 7).cast("string").as("N"))).as("M"))))
        .as("nested"))
    customer.select(
      concat(lit("a"), k.cast("string")).as("rid"), item.as("item"))
  }

  /** Build the stream-record envelope DataFrame from `customer`. */
  def envelope(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")

    val eventName =
      when(k % 10 === 9, "REMOVE")
        .when(k % 3 === 0, "MODIFY")
        .otherwise("INSERT")
    val hasImage = k % 17 =!= 3

    val eventId = when(k % 43 === 21, lit(null).cast("string"))
      .otherwise(concat(lit("ev"), (k % 50).cast("string")))
    val guestId = when(k % 47 === 22, lit(null).cast("string"))
      .otherwise(concat(lit("g"), k.cast("string")))
    val guestName = when(k % 29 === 7, lit(null).cast("string"))
      .otherwise(col("c_name"))

    // Local part mod 11 (not 97): with event_id mod 50 this makes
    // same-(event_id, email) pairs actually occur within one batch at
    // the tested scales (lcm(50,11)=550 < sf0.01's 1500 customers), so
    // the intra-batch duplicate-prevention layer is exercised by the
    // correctness gate. The capitalized 'Guest' branch exercises the
    // raw-vs-lowercased probe quirk (those rows never match a probe).
    val local = when(k % 19 === 5, lit("unknown"))
      .when(k % 5 === 0, concat(lit("Guest"), (k % 11).cast("string")))
      .otherwise(concat(lit("guest"), (k % 11).cast("string")))
    val domain = when(k % 13 === 0, "example.com")
      .when(k % 13 === 1, "test.com")
      .otherwise("hapzea.com")
    val guestEmail = when(k % 23 === 11, lit(null).cast("string"))
      .when(k % 23 === 12, concat(lit("bad email"), k.cast("string")))
      .otherwise(concat(local, lit("@"), domain))

    val emailStatus =
      when(k % 11 === 4, "sent").otherwise(lit(null).cast("string"))
    val emailSent = k % 31 === 8
    val deliveryStatus = when(k % 7 === 1, "pending")
      .when(k % 7 === 2, "processing")
      .when(k % 7 === 3, "delivered")
      .otherwise(lit(null).cast("string"))

    val totalMatches = (k * 7) % 25
    val newMatches   = (k * 3) % 5
    val bestSim  = (k % 100).cast("double") / 100
    val avgSim   = (k % 50).cast("double") / 100
    val quality  = (k % 30).cast("double") / 100
    val overall  = (k % 90).cast("double") / 100

    val nImg = least(totalMatches, lit(12)).cast("int")
    // k%53==17 rows carry malformed embedded JSON — the one condition the
    // reference's decode throws on (index.js:378-384) → action 'error'.
    val matchedImagesJson = when(k % 53 === 17, lit("{corrupt"))
      .when(nImg >= 1,
      to_json(transform(sequence(lit(1), nImg), i => struct(
        concat(lit("https://pool/"), k.cast("string"), lit("/"),
          i.cast("string"), lit(".jpg")).as("pool_url"),
        concat(lit("img_"), i.cast("string"), lit(".jpg")).as("pool_filename"),
        ((lit(1000) - i * 7 - (k % 10)).cast("double") / 1000)
          .as("similarity_score"),
        ((lit(900) - i * 5).cast("double") / 1000).as("match_confidence")))))
      .otherwise(lit("[]"))
    val matchStats =
      concat(lit("{\"pool_size\": "), (k % 1000).cast("string"), lit("}"))

    val nullS = avS(lit(null).cast("string"))

    val newImage = struct(
      avS(eventId).as("eventId"),
      avS(guestId).as("guestId"),
      avS(guestName).as("guest_name"),
      avS(guestEmail).as("guest_email"),
      avS(concat(lit("+91"), k.cast("string"))).as("guest_phone"),
      avS(emailStatus).as("email_status"),
      nullS.as("whatsapp_status"),
      avS(concat(lit("https://cdn.hapzea.com/selfie/"), k.cast("string"),
        lit(".jpg"))).as("guest_selfie_url"),
      avS(concat(lit("reg"), k.cast("string"))).as("guest_registration_id"),
      avS(deliveryStatus).as("delivery_status"),
      avS(lit("2024-01-15T10:00:00.000Z")).as("processed_at"),
      avS(lit("2024-01-10T08:30:00.000Z")).as("created_at"),
      avS(lit("v2.1.0")).as("algorithm_version"),
      avS(when(k % 2 === 0, "full").otherwise("incremental")).as("update_mode"),
      avN(totalMatches).as("total_matches"),
      avN(newMatches).as("new_matches"),
      avN(bestSim).as("best_similarity"),
      avN(avgSim).as("average_similarity"),
      avN(quality).as("profile_quality"),
      avN(overall).as("overall_score"),
      avB(emailSent).as("email_sent"),
      avB(lit(false)).as("whatsapp_sent"),
      avS(matchedImagesJson).as("matched_images"),
      avS(matchStats).as("match_statistics"))

    val oldEmailStatus =
      when(k % 37 === 2, "sent").otherwise(lit(null).cast("string"))
    val oldDeliveryStatus =
      when(k % 41 === 3, "delivered").otherwise(lit(null).cast("string"))
    val oldTotalMatches = (k * 5) % 10

    val oldImage = struct(
      avS(eventId).as("eventId"),
      avS(guestId).as("guestId"),
      nullS.as("guest_name"),
      avS(guestEmail).as("guest_email"),
      nullS.as("guest_phone"),
      avS(oldEmailStatus).as("email_status"),
      nullS.as("whatsapp_status"),
      nullS.as("guest_selfie_url"),
      nullS.as("guest_registration_id"),
      avS(oldDeliveryStatus).as("delivery_status"),
      nullS.as("processed_at"),
      nullS.as("created_at"),
      nullS.as("algorithm_version"),
      nullS.as("update_mode"),
      avN(oldTotalMatches).as("total_matches"),
      avN(lit(0)).as("new_matches"),
      avN(lit(0.0)).as("best_similarity"),
      avN(lit(0.0)).as("average_similarity"),
      avN(lit(0.0)).as("profile_quality"),
      avN(lit(0.0)).as("overall_score"),
      avB(lit(false)).as("email_sent"),
      avB(lit(false)).as("whatsapp_sent"),
      avS(lit("[]")).as("matched_images"),
      avS(lit("{}")).as("match_statistics"))

    customer.select(
      concat(lit("r"), k.cast("string")).as("eventID"),
      eventName.as("eventName"),
      lit("arn:aws:dynamodb:local:000000000000:table/face_match_results/stream/2024")
        .as("eventSourceARN"),
      struct(
        k.cast("string").as("SequenceNumber"),
        when(hasImage, newImage).otherwise(lit(null).cast(Model.imageSchema))
          .as("NewImage"),
        when(eventName === "MODIFY", oldImage)
          .otherwise(lit(null).cast(Model.imageSchema)).as("OldImage"))
        .as("dynamodb"))
  }
}
