package graft.ops

import org.apache.spark.sql.DataFrame

/** Envelope codec surface — the reference's queue-message decode path
  * (base64 → utf-8 → JSON → field plucks with schema tolerance,
  * `/root/reference/main.py:378-386`, duplicated at
  * `azure_service.py:106-145`) as pure column algebra: `base64`/`unbase64`,
  * `to_json`/`from_json` with a declared schema. All codegen'd built-ins —
  * at 10^12 rows this is scan-time compute with nothing to shuffle.
  */
object EnvelopeOps {

  /** Build a base64(JSON) envelope per document and decode it back through
    * the declared schema (round trip within the engine, so the checked
    * outputs are the extracted fields, not the wire encoding). */
  def decodeRoundTrip(documents: DataFrame): DataFrame =
    documents
      .selectExpr("doc_id",
        "base64(encode(to_json(named_struct(" +
          "'ClientFileName', source, 'BatchId', doc_id, 'Body', substring(text, 1, 40)" +
          ")), 'UTF-8')) AS env")
      .selectExpr("doc_id",
        "from_json(decode(unbase64(env), 'UTF-8'), " +
          "'ClientFileName STRING, BatchId BIGINT, Body STRING') AS m")
      .selectExpr("doc_id",
        "m.ClientFileName AS client_file",
        "m.BatchId AS batch_id",
        "CAST(length(m.Body) AS BIGINT) AS body_len")
      .orderBy("doc_id")
}
