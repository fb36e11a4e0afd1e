package graft.llm

import graft.SparkTestBase
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("mediaFromDocuments: binary payload matches declared metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.media.length.toLong == r.declaredBytes),
      "utf-8 bytes of ascii-only text must equal char length")
    assert(rows.forall(r => r.kind == (if (r.id % 2 == 0) "image" else "audio")))
  }

  test("extractFeatures: batched decode path is deterministic and batch-size independent") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    val f1 = Multimodal.extractFeatures(media, batchSize = 1).collect().sortBy(_.id)
    val f64 = Multimodal.extractFeatures(media, batchSize = 64).collect().sortBy(_.id)
    assert(f1.toSeq == f64.toSeq, "batch shape must not change results")
    assert(f1.forall(f => f.meanByte > 0 && f.meanByte < 256))
    assert(f1.forall(f => f.headHex.length == 16))
  }

  test("declarative binaryFeatures agrees with the mapPartitions path on byte counts") {
    val docs = Tables.documents(spark, dir)
    val sql = Multimodal.binaryFeatures(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val mp = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs)).collect()
      .map(f => f.id -> f.nBytes).toMap
    assert(sql == mp)
  }
}
