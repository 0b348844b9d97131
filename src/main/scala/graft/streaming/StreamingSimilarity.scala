package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Online ANN serving: a stream of query vectors probed against the
  * epoch's IVF index — the retrieval half of a nearest-neighbor
  * feature service / RAG lookup, as a Structured Streaming stage.
  *
  * The index frames (cell-assigned corpus + trained centroids) are
  * BATCH tables: the build-once/serve-many contract of the stored
  * index family ([[graft.operators.Similarity.ivfProbeTopK]]'s
  * scaladoc), refreshed per ingest epoch, not per query. Serving is
  * STATELESS — each micro-batch's answer is a pure function of that
  * batch's query rows alone — so the right streaming form is batch
  * semantics per micro-batch via foreachBatch, NOT an incremental
  * stateful operator: the per-query top-k is a rank window (which
  * streaming's incremental model forbids mid-plan), and there is no
  * cross-batch state to carry. Every micro-batch's output is
  * bit-identical to `ivfProbeTopK` on the same query rows
  * (spec-pinned across batch slicings).
  *
  * At 100 TB the probe plan inside each micro-batch is the batch
  * operator's own: centroids and the (query × nprobe) probe list ride
  * ONE broadcast, the corpus streams in place, and the only shuffle
  * is the per-query top-k over probed cells — per-batch cost is
  * `nprobe · |cell|` per query, independent of corpus size.
  */
object StreamingSimilarity {

  /** Wire a query stream (idCol, vecCol rows) to IVF serving; `sink`
    * receives each micro-batch's ivfProbeTopK-shaped result
    * (query_id, cand_id, cell, score, rank) with the micro-batch id.
    * The caller sets trigger/checkpoint options and starts the query. */
  def serveIvf(queryStream: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label")(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queryStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Similarity.ivfProbeTopK(
        corpus, batch, centroids, k, nprobe, idCol, vecCol, cellCol), batchId)
    }
}
