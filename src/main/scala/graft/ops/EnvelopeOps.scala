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

  /** Deterministic envelope corpus with planted defects, for exercising the
    * validation gate: every 7th doc omits `ClientFileName`, every 11th has
    * it empty, every 5th omits `UploadDatasheetid`, every 3rd omits
    * `DocReceivedId`. JSON is built by string concatenation (not `to_json`)
    * so absent-vs-null semantics are explicit and engine-identical; the
    * interpolated `source` value is JSON-escaped (backslash, then quote) —
    * un-escaped, a quote in the data would yield malformed JSON that Spark
    * silently NULLs (wrong quarantine verdict) and DuckDB throws on. */
  def synthesizeEnvelopes(documents: DataFrame): DataFrame =
    documents.selectExpr("doc_id",
      "concat('{', concat_ws(', ', " +
        "IF(doc_id % 7 = 0, CAST(NULL AS STRING), " +
        "  concat('\"ClientFileName\": \"', " +
        "    IF(doc_id % 11 = 0, '', replace(replace(source, '\\\\', '\\\\\\\\'), '\"', '\\\\\"')), '\"')), " +
        "IF(doc_id % 5 = 0, CAST(NULL AS STRING), " +
        "  concat('\"UploadDatasheetid\": ', CAST(doc_id * 10 + 1 AS STRING))), " +
        "IF(doc_id % 3 = 0, CAST(NULL AS STRING), " +
        "  concat('\"DocReceivedId\": ', CAST(doc_id * 10 + 2 AS STRING))), " +
        "concat('\"BatchId\": ', CAST(doc_id AS STRING))), '}') AS env")

  /** Validation gate mirroring the reference's required-field checks
    * (`/root/reference/main.py:94-110`): a missing or empty `ClientFileName`
    * hard-fails the message (reference returns False → redelivery); missing
    * `UploadDatasheetid` / `DocReceivedId` / `BatchId` only warn. One
    * codegen'd pass per row — no shuffle; split the result with two filters
    * ([[splitValid]]) for the error-side output. */
  def validateEnvelope(envelopes: DataFrame): DataFrame =
    envelopes
      .selectExpr("doc_id",
        "get_json_object(env, '$.ClientFileName') AS client_file",
        "CAST(get_json_object(env, '$.UploadDatasheetid') AS BIGINT) AS upload_datasheet_id",
        "CAST(get_json_object(env, '$.DocReceivedId') AS BIGINT) AS doc_received_id",
        "CAST(get_json_object(env, '$.BatchId') AS BIGINT) AS batch_id")
      .selectExpr("doc_id", "client_file", "upload_datasheet_id", "doc_received_id", "batch_id",
        "(client_file IS NOT NULL AND client_file != '') AS valid",
        "concat_ws(',', " +
          "IF(upload_datasheet_id IS NULL, 'UploadDatasheetid', CAST(NULL AS STRING)), " +
          "IF(doc_received_id IS NULL, 'DocReceivedId', CAST(NULL AS STRING)), " +
          "IF(batch_id IS NULL, 'BatchId', CAST(NULL AS STRING))) AS missing_warn")
      .orderBy("doc_id")

  /** (valid rows, error-side rows) — the quarantine split. */
  def splitValid(validated: DataFrame): (DataFrame, DataFrame) =
    (validated.where("valid"), validated.where("NOT valid"))
}
