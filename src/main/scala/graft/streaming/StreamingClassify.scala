package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Quality

/** Online NB inference against an offline-trained artifact — the
  * sealed-model / live-traffic half of the classifier lifecycle
  * ([[graft.model.Artifacts.saveNb]] publishes the model;
  * this serves it), the same shape as the IVF sealed+delta pair.
  *
  * Scoring is per-document-local (broadcast model joins + a per-doc
  * aggregate), so each micro-batch runs the SAME batch operator
  * ([[Quality.nbScore]]) with no cross-batch state, no watermark, no
  * shuffle beyond the in-batch doc aggregation —
  * StreamingClassifySpec proves streamed scores equal the one-shot
  * batch scores row for row, across any micro-batch slicing.
  */
object StreamingClassify {

  /** Start scoring a (doc_id, text, …) stream; each micro-batch's
    * per-doc (predicted, score_micro) rows go to `sink`. */
  def start(docs: DataFrame, model: Quality.NbModel,
      carry: Seq[String] = Nil)(sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(Quality.nbScore(batch, model, carry))
      }
      .start()
}
