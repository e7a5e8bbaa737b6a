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

  /** O9 — isValidEmail (index.js:400-403). */
  def isValidEmail(email: Column): Column =
    email.isNotNull && email.rlike(EmailRegex)

  /** O5 — already-sent on the current image (index.js:167-184). */
  def alreadySentNew(emailStatus: Column, emailSent: Column): Column =
    emailStatus === "sent" || emailSent === true

  /** O10 — deny-listed addresses (index.js:433-439). */
  def denyListed(email: Column): Column =
    email.contains("example.com") || email.contains("test.com") ||
      email.startsWith("unknown@")

  /** Full per-record decision. Inputs are the decoded columns plus
    * `dupHit` (O7 lookup result — whether any row for
    * (event_id, lower(guest_email)) is already processing/delivered/sent).
    *
    * Returns the (action, reason) pair with
    * action ∈ {email_triggered, skipped, duplicate_prevented}.
    */
  def actionReason(
      eventName: Column,
      hasNewImage: Column,
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
      minMatches: Int = 1): (Column, Column) = {

    val isModify = eventName === "MODIFY"

    val skip    = lit("skipped")
    val dup     = lit("duplicate_prevented")
    val trigger = lit("email_triggered")

    // Each branch: (predicate, action, reason) in reference order.
    val branches: Seq[(Column, Column, Column)] = Seq(
      // O2 — event-type filter (index.js:146-153)
      (!eventName.isin("INSERT", "MODIFY"), skip,
        concat(lit("Event type "), eventName, lit(" not relevant"))),
      // O3 — null-image filter (index.js:155-162)
      (!hasNewImage, skip, lit("No NewImage data")),
      // O5 — sent/delivered in current image (index.js:167-184)
      (alreadySentNew(emailStatus, emailSent), skip,
        lit("Email already sent - found in current record")),
      (deliveryStatus === "delivered", skip,
        lit("Email already delivered - delivery_status check")),
      // O6 — old-image CDC rules, MODIFY only (index.js:187-221)
      (isModify && alreadySentNew(oldEmailStatus, oldEmailSent), skip,
        lit("Email already sent - found in old record")),
      (isModify && oldDeliveryStatus === "delivered", skip,
        lit("Email already delivered - old record check")),
      (isModify && newMatches === 0 && oldTotalMatches > 0, skip,
        lit("Pool expansion update with no new matches - email already sent for existing matches")),
      // O7 — dedup lookup (index.js:228-244)
      (dupHit, dup, lit("Email job already exists for this address")),
      // O9 — validation, in reference field order (index.js:387-398)
      (eventId.isNull, skip, lit("Missing eventId")),
      (guestId.isNull, skip, lit("Missing guestId")),
      (!isValidEmail(guestEmail), skip, lit("Missing or invalid guest email")),
      (guestName.isNull, skip, lit("Missing guest name")),
      // O10 — business rules (index.js:409-442). The sent re-check is
      // unreachable here (O5 already skipped those) but kept for fidelity.
      (alreadySentNew(emailStatus, emailSent), skip,
        lit("Email already sent (email_status check)")),
      (totalMatches < minMatches, skip,
        concat(lit("Insufficient matches: "), totalMatches.cast("string"),
          lit(s" < $minMatches"))),
      (deliveryStatus === "delivered", skip,
        lit("Email already delivered (delivery_status)")),
      (deliveryStatus === "processing", skip,
        lit("Email delivery already in progress")),
      (denyListed(guestEmail), skip, lit("Test or invalid email address")))

    val action = branches.foldRight(trigger) { case ((p, a, _), acc) =>
      when(p, a).otherwise(acc)
    }
    val reason = branches.foldRight(lit("All criteria met"): Column) {
      case ((p, _, r), acc) => when(p, r).otherwise(acc)
    }
    (action, reason)
  }
}
