package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply — MERGE INTO semantics as a plain
  * DataFrame operator (no table format required): fold a change
  * stream (insert / update / delete rows with a sequence number)
  * into a target snapshot.
  *
  * Plan shape, three bounded steps — this is the scale-sound way to
  * express MERGE without a storage engine:
  *   1. last-writer-wins per key over the CHANGES (one window
  *      shuffle on the change stream — typically ≪ target);
  *   2. one LEFT ANTI join drops target rows that have any change
  *      (a hash join on the keys; the target never sorts);
  *   3. union the surviving target rows with the non-delete finals.
  * No full outer join, no per-column coalesce cascade, target
  * scanned once.
  */
object Cdc {

  /** `changes` must carry the target's columns plus `opCol`
    * ('I' | 'U' | 'D') and `seqCol` (monotone change order; ties
    * broken arbitrarily — feed unique sequence numbers per key for
    * deterministic output). A key's final op 'D' deletes it; 'I'/'U'
    * upsert the change row's values.
    */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "op",
      seqCol: String = "seq"): DataFrame =
    fold(target, changes, keyCols, opCol, Seq(col(seqCol).desc),
      Seq(opCol, seqCol))

  /** The LWW fold with a CALLER-SUPPLIED change order (descending —
    * first row per key wins) and an explicit list of change-metadata
    * columns to drop from the upserted rows. [[applyChanges]] is the
    * single-sequence instance; [[MergeOnRead.read]] orders by
    * (batch, seq) so later delta batches beat earlier ones even when
    * producers restart their per-batch sequence numbers.
    */
  private[operators] def fold(target: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String,
      orderDesc: Seq[org.apache.spark.sql.Column],
      metaCols: Seq[String],
      broadcastKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "fold needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderDesc: _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // the hint sits exactly on the anti-join's build side: with a
    // broadcast changed-key set the (fact-scale) target neither
    // shuffles nor sorts — it streams through one hash probe
    val keySet = latest.select(keyCols.map(col): _*)
    val untouched = target.join(
      if (broadcastKeys) broadcast(keySet) else keySet,
      keyCols, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D").drop(metaCols: _*)
    untouched.unionByName(upserts)
  }

  /** Plain upsert (no deletes, updates win wholesale): target rows
    * without a matching update + every update row.
    */
  def upsert(target: DataFrame, updates: DataFrame,
      keyCols: Seq[String]): DataFrame =
    target.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)
}
