package graft.oracle

/** Independent ANSI-SQL (DuckDB) formulations of every oracle-checkable
  * query in SparkEntry. The pipeline queries share `fixtureCte`, the SQL
  * mirror of graft.pipeline.MatchFixture — same pure integer/string
  * arithmetic over `customer`, so both engines derive identical envelopes
  * and the driver's hash compare is exact.
  */
object OracleSql {

  /** Decoded-fixture CTE chain:
    *   `f`  = flat decoded record (post-O4 semantics: image-less rows have
    *          NULL strings and 0 numerics, parse_error marks corrupt
    *          embedded JSON);
    *   `p1` = f + snapshot dup lookup (O7 layer 1) + the blocker flag
    *          (would this record write a status row the reference's later
    *          records can see);
    *   `p`  = p1 + intra-batch dup (O7 layer 2: windowed count of earlier
    *          blockers on (event_id, lower(email)) in sequence order);
    *   `d`  = p + (action, reason) — the O2..O10 cascade in reference
    *          order. */
  val fixtureCte: String = """
WITH f AS (
  SELECT
    c_custkey AS k,
    c_custkey AS seq,
    'r' || CAST(c_custkey AS VARCHAR) AS record_id,
    CASE WHEN c_custkey % 10 = 9 THEN 'REMOVE'
         WHEN c_custkey % 3 = 0 THEN 'MODIFY'
         ELSE 'INSERT' END AS event_name,
    c_custkey % 17 <> 3 AS has_new_image,
    (c_custkey % 17 <> 3 AND c_custkey % 53 = 17) AS parse_error,
    CASE WHEN c_custkey % 17 <> 3 AND c_custkey % 43 <> 21
         THEN 'ev' || CAST(c_custkey % 50 AS VARCHAR) END AS event_id,
    CASE WHEN c_custkey % 17 <> 3 AND c_custkey % 47 <> 22
         THEN 'g' || CAST(c_custkey AS VARCHAR) END AS guest_id,
    CASE WHEN c_custkey % 17 <> 3 AND c_custkey % 29 <> 7
         THEN c_name END AS guest_name,
    CASE WHEN c_custkey % 17 <> 3 THEN
      CASE WHEN c_custkey % 23 = 11 THEN NULL
           WHEN c_custkey % 23 = 12 THEN 'bad email' || CAST(c_custkey AS VARCHAR)
           ELSE (CASE WHEN c_custkey % 19 = 5 THEN 'unknown'
                      WHEN c_custkey % 5 = 0 THEN 'Guest' || CAST(c_custkey % 11 AS VARCHAR)
                      ELSE 'guest' || CAST(c_custkey % 11 AS VARCHAR) END)
                || '@' ||
                (CASE WHEN c_custkey % 13 = 0 THEN 'example.com'
                      WHEN c_custkey % 13 = 1 THEN 'test.com'
                      ELSE 'hapzea.com' END)
      END END AS guest_email,
    CASE WHEN c_custkey % 17 <> 3 THEN '+91' || CAST(c_custkey AS VARCHAR) END AS guest_phone,
    CASE WHEN c_custkey % 17 <> 3 AND c_custkey % 11 = 4 THEN 'sent' END AS email_status,
    CASE WHEN c_custkey % 17 <> 3 THEN c_custkey % 31 = 8 END AS email_sent,
    CASE WHEN c_custkey % 17 <> 3 THEN
      CASE WHEN c_custkey % 7 = 1 THEN 'pending'
           WHEN c_custkey % 7 = 2 THEN 'processing'
           WHEN c_custkey % 7 = 3 THEN 'delivered' END
    END AS delivery_status,
    CASE WHEN c_custkey % 17 <> 3 THEN CAST((c_custkey*7) % 25 AS INT) ELSE 0 END AS total_matches,
    CASE WHEN c_custkey % 17 <> 3 THEN CAST((c_custkey*3) % 5 AS INT) ELSE 0 END AS new_matches,
    CASE WHEN c_custkey % 17 <> 3 THEN CAST(c_custkey % 100 AS DOUBLE)/100 ELSE 0.0 END AS best_similarity,
    CASE WHEN c_custkey % 17 <> 3 THEN CAST(c_custkey % 50 AS DOUBLE)/100 ELSE 0.0 END AS average_similarity,
    CASE WHEN c_custkey % 17 <> 3 THEN CAST(c_custkey % 30 AS DOUBLE)/100 ELSE 0.0 END AS profile_quality,
    CASE WHEN c_custkey % 17 <> 3 THEN CAST(c_custkey % 90 AS DOUBLE)/100 ELSE 0.0 END AS overall_score,
    CASE WHEN c_custkey % 17 <> 3 THEN 'reg' || CAST(c_custkey AS VARCHAR) END AS registration_id,
    CASE WHEN c_custkey % 17 <> 3 THEN 'https://cdn.hapzea.com/selfie/' || CAST(c_custkey AS VARCHAR) || '.jpg' END AS selfie_url,
    CASE WHEN c_custkey % 17 <> 3 THEN '2024-01-15T10:00:00.000Z' END AS processed_at,
    CASE WHEN c_custkey % 17 <> 3 THEN 'v2.1.0' END AS algorithm_version,
    CASE WHEN c_custkey % 3 = 0 AND c_custkey % 37 = 2 THEN 'sent' END AS old_email_status,
    CASE WHEN c_custkey % 3 = 0 THEN false END AS old_email_sent,
    CASE WHEN c_custkey % 3 = 0 AND c_custkey % 41 = 3 THEN 'delivered' END AS old_delivery_status,
    CASE WHEN c_custkey % 3 = 0 THEN CAST((c_custkey*5) % 10 AS INT) ELSE 0 END AS old_total_matches,
    CAST(CASE WHEN c_custkey % 53 = 17 THEN 0
              ELSE least((c_custkey*7) % 25, 12) END AS INT) AS n_img
  FROM customer
),
status AS (
  SELECT DISTINCT event_id, guest_email FROM f
  WHERE delivery_status IN ('processing','delivered') OR email_status = 'sent'
),
p1 AS (
  SELECT f.*,
    EXISTS (
      SELECT 1 FROM status s
      WHERE s.event_id = f.event_id AND s.guest_email = lower(f.guest_email)
    ) AS snap_dup,
    (event_name IN ('INSERT','MODIFY') AND has_new_image AND NOT parse_error
     AND NOT (
       COALESCE(email_status = 'sent' OR email_sent = true, false)
       OR COALESCE(delivery_status = 'delivered', false)
       OR (event_name = 'MODIFY' AND (
            COALESCE(old_email_status = 'sent' OR old_email_sent = true, false)
            OR COALESCE(old_delivery_status = 'delivered', false)
            OR (new_matches = 0 AND old_total_matches > 0)))
     )) AS reaches_dup_check,
    (event_id IS NOT NULL AND guest_id IS NOT NULL
     AND guest_email IS NOT NULL
     AND regexp_matches(guest_email, '^[^\s@]+@[^\s@]+\.[^\s@]+$')
     AND guest_name IS NOT NULL AND total_matches >= 1
     AND NOT COALESCE(delivery_status = 'processing', false)
     AND NOT (contains(guest_email, 'example.com')
              OR contains(guest_email, 'test.com')
              OR starts_with(guest_email, 'unknown@'))) AS would_pass
  FROM f
),
p AS (
  SELECT p1.*,
    (snap_dup OR (
      event_id IS NOT NULL AND guest_email IS NOT NULL
      AND COALESCE(SUM(CASE WHEN reaches_dup_check AND (snap_dup OR would_pass)
                                 AND guest_email = lower(guest_email)
                            THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_id, lower(guest_email)
                         ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) > 0
    )) AS dup_hit
  FROM p1
),
d AS (
  SELECT p.*,
    CASE
      WHEN event_name NOT IN ('INSERT','MODIFY') THEN 'skipped'
      WHEN NOT has_new_image THEN 'skipped'
      WHEN parse_error THEN 'error'
      WHEN email_status = 'sent' OR email_sent = true THEN 'skipped'
      WHEN delivery_status = 'delivered' THEN 'skipped'
      WHEN event_name = 'MODIFY' AND (old_email_status = 'sent' OR old_email_sent = true) THEN 'skipped'
      WHEN event_name = 'MODIFY' AND old_delivery_status = 'delivered' THEN 'skipped'
      WHEN event_name = 'MODIFY' AND new_matches = 0 AND old_total_matches > 0 THEN 'skipped'
      WHEN dup_hit THEN 'duplicate_prevented'
      WHEN event_id IS NULL THEN 'skipped'
      WHEN guest_id IS NULL THEN 'skipped'
      WHEN guest_email IS NULL OR NOT regexp_matches(guest_email, '^[^\s@]+@[^\s@]+\.[^\s@]+$') THEN 'skipped'
      WHEN guest_name IS NULL THEN 'skipped'
      WHEN email_status = 'sent' OR email_sent = true THEN 'skipped'
      WHEN total_matches < 1 THEN 'skipped'
      WHEN delivery_status = 'delivered' THEN 'skipped'
      WHEN delivery_status = 'processing' THEN 'skipped'
      WHEN contains(guest_email, 'example.com') OR contains(guest_email, 'test.com') OR starts_with(guest_email, 'unknown@') THEN 'skipped'
      ELSE 'email_triggered'
    END AS action,
    CASE
      WHEN event_name NOT IN ('INSERT','MODIFY') THEN 'Event type ' || event_name || ' not relevant'
      WHEN NOT has_new_image THEN 'No NewImage data'
      WHEN parse_error THEN 'Failed to parse DynamoDB record'
      WHEN email_status = 'sent' OR email_sent = true THEN 'Email already sent - found in current record'
      WHEN delivery_status = 'delivered' THEN 'Email already delivered - delivery_status check'
      WHEN event_name = 'MODIFY' AND (old_email_status = 'sent' OR old_email_sent = true) THEN 'Email already sent - found in old record'
      WHEN event_name = 'MODIFY' AND old_delivery_status = 'delivered' THEN 'Email already delivered - old record check'
      WHEN event_name = 'MODIFY' AND new_matches = 0 AND old_total_matches > 0 THEN 'Pool expansion update with no new matches - email already sent for existing matches'
      WHEN dup_hit THEN 'Email job already exists for this address'
      WHEN event_id IS NULL THEN 'Missing eventId'
      WHEN guest_id IS NULL THEN 'Missing guestId'
      WHEN guest_email IS NULL OR NOT regexp_matches(guest_email, '^[^\s@]+@[^\s@]+\.[^\s@]+$') THEN 'Missing or invalid guest email'
      WHEN guest_name IS NULL THEN 'Missing guest name'
      WHEN email_status = 'sent' OR email_sent = true THEN 'Email already sent (email_status check)'
      WHEN total_matches < 1 THEN 'Insufficient matches: ' || CAST(total_matches AS VARCHAR) || ' < 1'
      WHEN delivery_status = 'delivered' THEN 'Email already delivered (delivery_status)'
      WHEN delivery_status = 'processing' THEN 'Email delivery already in progress'
      WHEN contains(guest_email, 'example.com') OR contains(guest_email, 'test.com') OR starts_with(guest_email, 'unknown@') THEN 'Test or invalid email address'
      ELSE 'All criteria met'
    END AS reason
  FROM p
)
"""

  val pipeActions: String = fixtureCte +
    "SELECT record_id, action, reason FROM d"

  val pipeEmailJobs: String = fixtureCte + """
SELECT record_id, event_id, guest_id, guest_name, guest_email, guest_phone,
       registration_id, selfie_url,
       total_matches, new_matches, best_similarity, average_similarity, profile_quality,
       'https://hapzea.com/gallery/' || event_id || '/' || guest_id AS gallery_url,
       'Event ' || event_id AS event_label,
       processed_at, algorithm_version,
       CASE WHEN total_matches >= 10 THEN 'high' ELSE 'normal' END AS priority,
       CAST(CASE WHEN total_matches >= 10 THEN 0 ELSE 5 END AS INT) AS delay_seconds,
       event_id || '-' || lower(guest_email) AS dedup_id,
       CAST(least(n_img, 10) AS INT) AS n_top_matches
FROM d WHERE action = 'email_triggered'"""

  val pipeTopMatches: String = fixtureCte + """
SELECT record_id, event_id, guest_id,
       CAST(i AS INT) AS match_rank,
       'https://pool/' || CAST(k AS VARCHAR) || '/' || CAST(i AS VARCHAR) || '.jpg' AS image_url,
       'img_' || CAST(i AS VARCHAR) || '.jpg' AS filename,
       CAST(1000 - i*7 - (k % 10) AS DOUBLE)/1000 AS similarity,
       CAST(900 - i*5 AS DOUBLE)/1000 AS confidence
FROM d, UNNEST(range(1, CAST(least(n_img, 10) AS BIGINT) + 1)) AS t(i)
WHERE action = 'email_triggered'"""

  val pipeStatusUpdates: String = fixtureCte + """
SELECT record_id, event_id, guest_id,
       CASE WHEN action = 'duplicate_prevented' THEN 'delivered' ELSE 'processing' END AS new_delivery_status,
       CASE WHEN action = 'duplicate_prevented' THEN 'duplicate_detected_at' ELSE 'email_triggered_at' END AS touch_field
FROM d WHERE action IN ('duplicate_prevented','email_triggered')"""

  val pipeBatchFailures: String = fixtureCte + """
SELECT record_id AS item_identifier FROM d WHERE action = 'error'"""

  /** O14's envelope minus the JSON body (JSON text formatting is
    * engine-specific; the body shape is asserted by EmailJobsSpec).
    * Timestamps are injected constants — SURVEY.md §7.4 determinism. */
  val pipeSqsAttrs: String = fixtureCte + """
SELECT 'email_' || event_id || '_' || guest_id || '_1705708800000' AS id,
       'photo_match_notification' AS type,
       'photo_match_notification' AS attr_message_type,
       event_id AS attr_event_id,
       guest_id AS attr_guest_id,
       lower(guest_email) AS attr_guest_email,
       CASE WHEN total_matches >= 10 THEN 'high' ELSE 'normal' END AS attr_priority,
       CAST(total_matches AS VARCHAR) AS attr_total_matches,
       CAST(CASE WHEN total_matches >= 10 THEN 0 ELSE 5 END AS INT) AS delay_seconds,
       event_id || '-' || lower(guest_email) AS dedup_id
FROM d WHERE action = 'email_triggered'"""

  /** Full-AttributeValue decode (r19 extension): the Spark side round-
    * trips every standard DynamoDB tag through the wire encoding
    * (MatchFixture.attrItems → DynamoDecode.decodeAttrItems); the
    * oracle computes the decoded values straight from `c_custkey`
    * arithmetic, never touching the wire format — any mis-decode of
    * S/N/BOOL/NULL/B/SS/NS/BS/L/M (or the L-of-M-of-N nesting)
    * diverges the hash. */
  val pipeDecodeAttrs: String = """
SELECT 'a' || CAST(c_custkey AS VARCHAR) AS rid,
       CASE WHEN c_custkey % 9 = 4 THEN 'absent'
            ELSE 'guest ' || CAST(c_custkey % 50 AS VARCHAR) END AS name_s,
       CAST(18 + c_custkey % 60 AS INT) AS age_n,
       (c_custkey % 3 = 0) AS vip_b,
       (c_custkey % 7 = 2) AS note_isnull,
       md5('av' || CAST(c_custkey AS VARCHAR)) AS avatar_md5,
       CAST(length('av' || CAST(c_custkey AS VARCHAR)) AS INT) AS avatar_len,
       't' || CAST(c_custkey % 5 AS VARCHAR) || ',u' ||
         CAST(c_custkey % 7 AS VARCHAR) AS tags_cat,
       CAST(c_custkey % 10 + c_custkey % 13 + c_custkey % 17 AS INT) AS scores_sum,
       md5('p' || CAST(c_custkey AS VARCHAR) ||
           'q' || CAST(c_custkey AS VARCHAR)) AS blobs_md5,
       CAST(c_custkey % 4 AS INT) AS gallery_n,
       CASE WHEN c_custkey % 4 >= 1
            THEN 'g/' || CAST(c_custkey AS VARCHAR) || '/1'
            ELSE 'none' END AS gallery_first,
       'c' || CAST(c_custkey % 20 AS VARCHAR) AS city_s,
       CAST(10000 + c_custkey % 100 AS INT) AS zip_n,
       CAST((c_custkey % 7) + ((c_custkey * 2) % 7) AS INT) AS nested_sum
FROM customer"""

  /** r19 tombstone extension: REMOVE rows → (action, reason) decisions.
    * The fixture's REMOVE rows carry NewImage (a real stream's carry
    * OldImage; the engine coalesces), so the oracle reads f's decoded
    * fields directly. */
  val pipeTombstones: String = fixtureCte + """
SELECT record_id, event_id, guest_id,
       lower(guest_email) AS guest_email,
       CASE WHEN event_id IS NOT NULL AND guest_id IS NOT NULL
            THEN 'tombstoned' ELSE 'tombstone_skipped' END AS action,
       CASE WHEN event_id IS NOT NULL AND guest_id IS NOT NULL
            THEN 'Record deleted upstream - tombstone propagated'
            ELSE 'No key data on REMOVE image' END AS reason
FROM f WHERE event_name = 'REMOVE'"""

  val pipeMetrics: String = fixtureCte + """
SELECT CAST(count(*) AS BIGINT) AS total_records,
       CAST(SUM(CASE WHEN action <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS processed_records,
       CAST(SUM(CASE WHEN action = 'email_triggered' THEN 1 ELSE 0 END) AS BIGINT) AS emails_triggered,
       CAST(SUM(CASE WHEN action = 'skipped' THEN 1 ELSE 0 END) AS BIGINT) AS skipped_records,
       CAST(SUM(CASE WHEN action = 'duplicate_prevented' THEN 1 ELSE 0 END) AS BIGINT) AS duplicates_prevented,
       CAST(SUM(CASE WHEN action = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_records
FROM d"""
}
