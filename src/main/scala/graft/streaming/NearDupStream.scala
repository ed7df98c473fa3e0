package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import graft.ops.Dedup

/** Streaming near-duplicate detection: MinHash band-bucket state.
  *
  * The batch pipeline (Dedup.minhashPairs) buckets documents by LSH band
  * hash and joins within buckets; a stream cannot self-join its whole
  * history, so the bucket becomes STATE: each (band, bhash) key remembers
  * the canonical (first/lowest-id) document that produced it, and every
  * later document hitting an occupied bucket emits a candidate pair
  * (canonical, newcomer, band). Exactly like the batch operator, LSH only
  * PROPOSES — a downstream verifier applies exact Jaccard on the shingle
  * sets; and the banding construction is literally shared
  * (`Dedup.bandKeys` — one formula, both surfaces, cannot drift;
  * signature + band keys are per-row scan projections, so the only
  * streaming shuffle is the groupByKey on (band, bhash)).
  *
  * Dedup semantics are keep-first: a document is FLAGGED iff some bucket
  * already holds a lower-id/earlier canonical. StreamingSpec pins the
  * cross-surface law — when documents arrive in doc_id order, the flagged
  * set equals the batch banded-candidate `id_b` set on the same corpus.
  *
  * Scale shape: state is ONE long per occupied bucket (canonical doc_id)
  * — `bands ×` the deduped corpus size at worst, orders below the
  * signature data itself. Keep-first dedup state is inherently
  * append-only (a canonical never expires while the corpus it deduped
  * against is still "the corpus"); bounded-retention deployments
  * (dedup-within-30-days) get expiry by swapping the NoTimeout for the
  * event-time timeout exactly as `sessionizeWithState` demonstrates —
  * the state payload stays one long either way.
  */
object NearDupStream {

  final case class BandHit(doc_id: Long, band: Int, bhash: Int)
  final case class Candidate(id_a: Long, id_b: Long, band: Int)

  /** Candidate pairs from band-bucket state over a streaming (or batch)
    * documents frame with (doc_id, text). Output: `id_a` the bucket's
    * canonical document, `id_b` the flagged newcomer.
    */
  def candidates(documents: DataFrame, n: Int = 3, numHashes: Int = 32,
                 bands: Int = 16): Dataset[Candidate] = {
    val spark = documents.sparkSession
    import spark.implicits._
    Dedup.bandKeys(documents, n, numHashes, bands)
      .as[BandHit]
      .groupByKey(h => (h.band, h.bhash))
      .flatMapGroupsWithState[Long, Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Int), hits: Iterator[BandHit],
         state: GroupState[Long]) =>
          val ids = hits.map(_.doc_id).toArray.sorted
          val canonical = state.getOption
            .map(c => math.min(c, ids.head)).getOrElse(ids.head)
          state.update(canonical)
          ids.iterator.filter(_ != canonical)
            .map(d => Candidate(canonical, d, key._1))
      }
  }
}
