package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Count-gated broadcast hint — the BloomPrune discipline applied to
  * every vocabulary-cardinality build side.
  *
  * A forced `broadcast()` is a CAPACITY CLIFF, not a slow path: past
  * Spark's 8 GB broadcast hard limit (or the driver's heap) the plan
  * doesn't degrade, it dies. Vocabulary-sized tables look
  * broadcastable at test scale but are Heaps-law unbounded on web
  * text — the distinct whitespace tokens of a 100 TB crawl (typos,
  * URLs, ids, mojibake) run 10⁸–10⁹ rows, tens of GB as a hashed
  * relation. So every serve join against a vocabulary (BPE apply
  * table, TF-IDF document frequencies, LM bigram/left-context counts)
  * routes through this gate:
  *
  *  - n ≤ [[BroadcastCapRows]] (2²² rows — BloomPrune's literal-cap
  *    ancestor; ≲ a few hundred MB hashed for the widest of these
  *    tables, far under the 8 GB hard limit): the frame is returned
  *    with the broadcast hint, and the serve join is the map-side
  *    hash join the common case wants (the probe side never shuffles).
  *
  *  - n > cap: the hint is OMITTED — the join is already a plain
  *    equi-join, so the planner falls back to a shuffle hash/sort-merge
  *    join that scales with the vocabulary instead of dying at the
  *    driver. The probe side shuffles on the join key, which is the
  *    correct price: it is bounded by the data, not by one machine's
  *    memory. Both physical shapes compute the identical join, so
  *    correctness twins hold for either (CapGateSpec drives a
  *    5M-distinct-word vocabulary through the fallback and proves the
  *    results hash-equal to the broadcast plan's).
  *
  * The count that sizes the gate is one extra job over the build side;
  * callers pass an already-cached or landed (parquet — metadata-count)
  * frame so the gate costs metadata, not a recompute.
  */
object CapGate {
  /** Broadcast ceiling in build-side rows: 2²² (4.19M). */
  val BroadcastCapRows = 4194304L

  /** `broadcasted` is observability for specs (PlanSpec pins both
    * physical shapes); not part of the data contract. */
  final case class Gated(frame: DataFrame, rows: Long, broadcasted: Boolean)

  /** Gate `build` for use on the build side of an equi-join: hinted
    * broadcast under the cap, un-hinted (planner's choice — shuffle
    * join at this cardinality) past it. `capRows` is overridable so
    * specs can drive the fallback shape cheaply; production callers
    * use the default. */
  def gate(build: DataFrame, capRows: Long = BroadcastCapRows): Gated = {
    val n = build.count()
    if (n <= capRows) Gated(broadcast(build), n, broadcasted = true)
    else Gated(build, n, broadcasted = false)
  }
}
