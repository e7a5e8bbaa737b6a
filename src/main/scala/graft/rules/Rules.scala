package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O2/O3/O5/O6/O9/O10 — the reference's layered filter / validation /
  * business-rule chain, re-expressed as a single deterministic `when`
  * cascade producing (action, reason). Evaluation order matches the
  * reference exactly (index.js:146 → 155 → 167 → 177 → 187-221 → 228 →
  * 246 → 258 → 275): first matching rule wins, so skips remain explainable
  * with the same reason strings.
  *
  * All predicates are side-effect-free built-in Column ops, safe for
  * Catalyst to reorder internally while the `when` chain preserves the
  * first-match semantics.
  */
object Rules {

  val EmailRegex = "^[^\\s@]+@[^\\s@]+\\.[^\\s@]+$" // index.js:401

  /** ASCII-only lowercase. Spark 4's `lower()` routes through the ICU
    * collation case-mapping (CollationSupport.Lower.execBinaryICU), whose
    * class initialization loads ICU break dictionaries and measurably
    * dominated pipeline runtime (thread dumps showed the hot task inside
    * com.ibm.icu.impl.CaseMapImpl). The reference lowercases email
    * addresses only (index.js:117, 572, 592), which are ASCII here, so a
    * 26-char translate — a plain codegen'd byte map — is semantically
    * identical and orders of magnitude cheaper. */
  def asciiLower(c: Column): Column =
    translate(c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

  /** O9 — isValidEmail (index.js:400-403). */
  def isValidEmail(email: Column): Column =
    email.isNotNull && email.rlike(EmailRegex)

  /** O5 — already-sent on the current image (index.js:167-184). */
  def alreadySentNew(emailStatus: Column, emailSent: Column): Column =
    emailStatus === "sent" || emailSent === true

  /** The reference's deny-list constants (index.js:433-439) — the
    * defaults for the conf-driven lists in graft.GraftConf. */
  val DefaultDenyDomains: Seq[String] = Seq("example.com", "test.com")
  val DefaultDenyPrefixes: Seq[String] = Seq("unknown@")

  /** O10 — deny-listed addresses (index.js:433-439). */
  def denyListed(email: Column): Column =
    denyListed(email, DefaultDenyDomains, DefaultDenyPrefixes)

  /** O10 with configurable lists: containment per domain, startsWith
    * per prefix — the same substring semantics the reference uses. */
  def denyListed(email: Column, domains: Seq[String],
      prefixes: Seq[String]): Column =
    (domains.map(d => email.contains(d)) ++
      prefixes.map(p => email.startsWith(p)))
      .reduceOption(_ || _).getOrElse(lit(false))

  private def isTrue(c: Column): Column = coalesce(c, lit(false))

  /** Whether a record survives O2..O6 and the parse (index.js:146-221) and
    * therefore reaches the dedup lookup (index.js:228). Null-safe: absent
    * statuses mean "not skipped", exactly like the reference's
    * optional-chained comparisons. */
  def reachesDupCheck(
      eventName: Column,
      hasNewImage: Column,
      parseError: Column,
      emailStatus: Column,
      emailSent: Column,
      deliveryStatus: Column,
      newMatches: Column,
      oldEmailStatus: Column,
      oldEmailSent: Column,
      oldDeliveryStatus: Column,
      oldTotalMatches: Column): Column = {
    val isModify = eventName === "MODIFY"
    val skippedBefore =
      isTrue(alreadySentNew(emailStatus, emailSent)) ||
        isTrue(deliveryStatus === "delivered") ||
        (isModify && (
          isTrue(alreadySentNew(oldEmailStatus, oldEmailSent)) ||
            isTrue(oldDeliveryStatus === "delivered") ||
            (newMatches === 0 && oldTotalMatches > 0)))
    eventName.isin("INSERT", "MODIFY") && hasNewImage && !parseError &&
      !skippedBefore
  }

  /** Whether a record that reaches the dedup lookup would pass validation
    * (O9) and the business rules (O10) — i.e. trigger an email if no
    * duplicate exists. Used to decide which records write a status row
    * visible to later records of the same batch. */
  def passesValidationAndRules(
      eventId: Column,
      guestId: Column,
      guestName: Column,
      guestEmail: Column,
      deliveryStatus: Column,
      totalMatches: Column,
      minMatches: Int = 1,
      denyDomains: Seq[String] = DefaultDenyDomains,
      denyPrefixes: Seq[String] = DefaultDenyPrefixes): Column =
    eventId.isNotNull && guestId.isNotNull && isValidEmail(guestEmail) &&
      guestName.isNotNull && totalMatches >= minMatches &&
      !isTrue(deliveryStatus === "processing") &&
      !denyListed(guestEmail, denyDomains, denyPrefixes)

  /** Full per-record decision cascade, evaluated once as a single
    * struct-valued CaseWhen. Two separate (action, reason) cascades double
    * the generated code for what is one chain of predicates — and Janino
    * compile time of the fused stage, not row throughput, is what dominates
    * this pipeline's latency (thread dumps showed every task parked on
    * CodeGenerator.compile's KeyLock). Callers extract `.getField("action")`
    * / `.getField("reason")` behind a projection boundary, which Catalyst
    * keeps un-inlined because the producing expression is non-cheap. */
  def decisionStruct(
      eventName: Column,
      hasNewImage: Column,
      parseError: Column,
      eventId: Column,
      guestId: Column,
      guestName: Column,
      guestEmail: Column,
      emailStatus: Column,
      emailSent: Column,
      deliveryStatus: Column,
      totalMatches: Column,
      newMatches: Column,
      oldEmailStatus: Column,
      oldEmailSent: Column,
      oldDeliveryStatus: Column,
      oldTotalMatches: Column,
      dupHit: Column,
      minMatches: Int = 1,
      denyDomains: Seq[String] = DefaultDenyDomains,
      denyPrefixes: Seq[String] = DefaultDenyPrefixes): Column = {

    val isModify = eventName === "MODIFY"
    def out(action: String, reason: Column): Column =
      struct(lit(action).as("action"), reason.as("reason"))
    def outL(action: String, reason: String): Column =
      out(action, lit(reason))

    val branches: Seq[(Column, Column)] = Seq(
      // O2 — event-type filter (index.js:146-153)
      (!eventName.isin("INSERT", "MODIFY"),
        out("skipped", concat(lit("Event type "), eventName, lit(" not relevant")))),
      // O3 — null-image filter (index.js:155-162)
      (!hasNewImage, outL("skipped", "No NewImage data")),
      // O4 — parse failure: corrupt embedded JSON throws
      // (index.js:378-384), caught by the handler loop → action 'error'
      // and a batchItemFailures entry (index.js:70-79, 94-97). The
      // reference's reason carries the engine-specific JSON.parse
      // message; we keep the stable prefix only.
      (parseError, outL("error", "Failed to parse DynamoDB record")),
      // O5 — sent/delivered in current image (index.js:167-184)
      (alreadySentNew(emailStatus, emailSent),
        outL("skipped", "Email already sent - found in current record")),
      (deliveryStatus === "delivered",
        outL("skipped", "Email already delivered - delivery_status check")),
      // O6 — old-image CDC rules, MODIFY only (index.js:187-221)
      (isModify && alreadySentNew(oldEmailStatus, oldEmailSent),
        outL("skipped", "Email already sent - found in old record")),
      (isModify && oldDeliveryStatus === "delivered",
        outL("skipped", "Email already delivered - old record check")),
      (isModify && newMatches === 0 && oldTotalMatches > 0,
        outL("skipped", "Pool expansion update with no new matches - email already sent for existing matches")),
      // O7 — dedup lookup (index.js:228-244)
      (dupHit, outL("duplicate_prevented", "Email job already exists for this address")),
      // O9 — validation, in reference field order (index.js:387-398)
      (eventId.isNull, outL("skipped", "Missing eventId")),
      (guestId.isNull, outL("skipped", "Missing guestId")),
      (!isValidEmail(guestEmail), outL("skipped", "Missing or invalid guest email")),
      (guestName.isNull, outL("skipped", "Missing guest name")),
      // O10 — business rules (index.js:409-442)
      (alreadySentNew(emailStatus, emailSent),
        outL("skipped", "Email already sent (email_status check)")),
      (totalMatches < minMatches,
        out("skipped", concat(lit("Insufficient matches: "),
          totalMatches.cast("string"), lit(s" < $minMatches")))),
      (deliveryStatus === "delivered",
        outL("skipped", "Email already delivered (delivery_status)")),
      (deliveryStatus === "processing",
        outL("skipped", "Email delivery already in progress")),
      (denyListed(guestEmail, denyDomains, denyPrefixes),
        outL("skipped", "Test or invalid email address")))

    branches.foldRight(outL("email_triggered", "All criteria met")) {
      case ((p, o), acc) => when(p, o).otherwise(acc)
    }
  }
}
