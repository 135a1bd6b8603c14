package graft.queries

import graft.core.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE north star): binary payloads +
  * relational metadata. The decode itself is the stubbed `mapPartitions` pass
  * in `graft.ops.Multimodal` (exercised by unit tests); this query checks the
  * engine-portable binary/metadata layer. */
object MultimodalQs {

  val qs: Seq[Q] = Seq(
    Q("mm1_binary_metadata",
      (s, d) => Multimodal.asBinaryTable(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("byte_len"), col("checksum"),
          substring(col("checksum"), 1, 2).as("shard")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |md5(text) AS checksum, substr(md5(text), 1, 2) AS shard
             |FROM documents""".stripMargin))
  )
}
