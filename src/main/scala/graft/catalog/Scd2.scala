package graft.catalog

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history for registry tables.
  *
  * The reference's registry rows carry only `modified_ts` — an update
  * OVERWRITES the previous state (lambda/aws-dl-fmwrk-source-system-api/
  * lambda_function.py:94-111), so "what did this asset's config say when
  * batch X ran?" is unanswerable. SCD2 keeps every state with its
  * validity interval instead: `effective_from` / `effective_to` /
  * `is_current`, the standard lakehouse dimension-history contract.
  *
  * Shapes are pure DataFrame transforms so callers commit the result via
  * [[CommitLog]] (replace commit = the MERGE). Scale: one full-outer join
  * keyed on the dimension key per batch — registry dims are small, and
  * even for a 100 TB fact's large dimension this is the single-shuffle
  * MERGE plan every lakehouse runs; history grows by changed rows only.
  */
object Scd2 {

  private val metaCols = Seq("effective_from", "effective_to", "is_current")

  /** First load: every row current from `ts`. */
  def initial(batch: DataFrame, ts: Timestamp): DataFrame =
    batch
      .withColumn("effective_from", lit(ts))
      .withColumn("effective_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  /** Apply one update batch effective at `ts`:
    *  - a key whose payload CHANGED closes its current row
    *    (`effective_to = ts`) and opens a new current one;
    *  - a new key opens its first row;
    *  - an update identical to the current payload is a no-op (no
    *    spurious versions — idempotent re-delivery is safe);
    *  - closed history rows pass through untouched.
    */
  def applyBatch(history: DataFrame, updates: DataFrame, keyCol: String,
      ts: Timestamp): DataFrame = {
    val payload = updates.columns.filterNot(_ == keyCol).toSeq
    require(payload.nonEmpty, "scd2: updates carry no payload columns")
    require(history.columns.toSet == (updates.columns ++ metaCols).toSet,
      "scd2: history and updates schemas disagree")
    val closed = history.filter(!col("is_current"))
    val current = history.filter(col("is_current"))
    // updates folded into one struct so payload names can't collide
    val u = updates.select(col(keyCol),
      struct(payload.map(col): _*).as("_u"), lit(true).as("_has_u"))
    val j = current.join(u, Seq(keyCol), "full_outer")
    val hasC = col("is_current").isNotNull
    val hasU = coalesce(col("_has_u"), lit(false))
    val changed = hasC && hasU &&
      !(struct(payload.map(col): _*) <=> col("_u"))
    // current rows: close the changed ones, keep the rest verbatim
    val kept = j.filter(hasC).select(
      (col(keyCol) +: payload.map(col)) ++ Seq(
        col("effective_from"),
        when(changed, lit(ts)).otherwise(col("effective_to")).as("effective_to"),
        when(changed, lit(false)).otherwise(col("is_current")).as("is_current")): _*)
    // opened rows: changed keys' new state + brand-new keys
    val opened = j.filter(hasU && (changed || !hasC)).select(
      (col(keyCol) +: payload.map(p => col(s"_u.$p").as(p))) ++ Seq(
        lit(ts).as("effective_from"),
        lit(null).cast("timestamp").as("effective_to"),
        lit(true).as("is_current")): _*)
    val cols = history.columns.toSeq
    closed.select(cols.map(col): _*)
      .unionByName(kept.select(cols.map(col): _*))
      .unionByName(opened.select(cols.map(col): _*))
  }

  /** Point-in-time view: the payload that was current at `ts`. */
  def asOf(history: DataFrame, ts: Timestamp): DataFrame =
    history.filter(col("effective_from") <= lit(ts) &&
      (col("effective_to").isNull || col("effective_to") > lit(ts)))
}
