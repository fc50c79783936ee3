package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Column privacy — the engine analog of the reference's wired-in privacy
  * key for sensitive columns (reference: config/globalConfig.json:8 keeps
  * a `secret_name` for a column-privacy integration in the global config;
  * every registered asset may carry PII that the lake must not expose
  * raw).
  *
  * Three protection modes, all per-row codegen'd built-ins (narrow maps —
  * no shuffle, no UDF, embarrassingly parallel at 100 TB):
  *  - deterministic tokenization: sha2-256 pseudonym. Referentially
  *    stable (same value → same token everywhere), so joins / groupBys /
  *    dedup on the tokenized key keep working after the raw value is gone;
  *  - format-preserving masking: redact all but the trailing 4 characters
  *    of the identifier (the synthetic customer table carries PII only in
  *    `c_name`, shaped `Customer#NNNNNNNNN`), keeping the column shape for
  *    downstream format validators;
  *  - reversible encryption: AES round-trip via aes_encrypt/aes_decrypt —
  *    GCM's random IV makes ciphertext non-deterministic, so this is
  *    proven by PrivacySpec's round-trip property, not a value oracle.
  */
object Privacy {

  /** Declared query: pseudonymize + mask the customer PII columns. */
  private def maskSensitive(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
        col("c_custkey"),
        concat(lit("anon-"), substring(sha2(col("c_name"), 256), 1, 16))
          .as("name_token"),
        concat(lit("Customer#*****"), expr("right(c_name, 4)")).as("name_masked"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Key material as a Column that never appears in plan strings —
    * explain output, the UI SQL tab, event logs, and error messages all
    * render `graft_secret_key(<name>, v<ver>)` instead of the key (see
    * `graft.functions.SecretKeyRef`).
    */
  private def keyRef(name: String, version: Int, key: String) =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.SecretKeyRef(name, version, key))

  /** AES round-trip used by PrivacySpec: encrypt then decrypt a column
    * with the same key; the result must equal the input byte-for-byte.
    * The key is passed as a bound Column, never interpolated into SQL
    * text (injection-proof and absent from the parsed query string), and
    * rides a `SecretKeyRef` so it is absent from plan strings too.
    */
  def aesRoundTrip(df: DataFrame, column: String, key: String): DataFrame =
    df.withColumn("_rt",
      call_function("aes_decrypt",
        call_function("aes_encrypt", col(column), keyRef("adhoc", 0, key)),
        keyRef("adhoc", 0, key)).cast("string"))

  /** Encrypt `column` under the CURRENT version of a named secret,
    * recording the key version beside the ciphertext (`<col>_enc`,
    * `<col>_key_ver`) and dropping the plaintext. The stored version is
    * what keeps old ciphertext decryptable after a rotation. Narrow
    * per-row map — no shuffle at any scale. The key rides a
    * `SecretKeyRef`, so plan strings (explain / UI / event logs) carry
    * only the secret's NAME and version, never the material — the plan
    * is loggable.
    */
  def encryptWith(df: DataFrame, column: String, p: SecretProvider,
      name: String): DataFrame = {
    val v = p.currentVersion(name)
    df.withColumn(s"${column}_enc",
        call_function("aes_encrypt", col(column), keyRef(name, v, p.key(name, v))))
      .withColumn(s"${column}_key_ver", lit(v))
      .drop(column)
  }

  /** Decrypt `<col>_enc` back to `column`, resolving each ROW's key from
    * its recorded version — a literal version→key map keyed by the STABLE
    * version identifiers, so rows written before and after a rotation
    * decrypt side by side even after retired versions are destroyed.
    * A row whose recorded version is no longer live FAILS the query
    * (raise_error) instead of silently decrypting to null — a missing key
    * is data loss and must be loud. Map values are `SecretKeyRef`s, so
    * the version map prints as names+versions, never material.
    */
  def decryptWith(df: DataFrame, column: String, p: SecretProvider,
      name: String): DataFrame = {
    val keyByVer = map(p.secret(name).flatMap {
      case (v, k) => Seq(lit(v), keyRef(name, v, k))
    }: _*)
    val ver = col(s"${column}_key_ver").cast("int")
    df.withColumn(column,
        call_function("aes_decrypt",
          col(s"${column}_enc"),
          coalesce(element_at(keyByVer, ver),
            raise_error(concat(
              lit(s"decrypt $column: secret '$name' has no live version "),
              ver.cast("string")))))
          .cast("string"))
      .drop(s"${column}_enc", s"${column}_key_ver")
  }

  /** Key rotation: decrypt every row under its recorded (old) version and
    * re-encrypt under the provider's current one. After this, all rows
    * carry the current key version and the retired key can be destroyed —
    * the operational step the reference's named-secret indirection exists
    * to allow.
    */
  def rotate(df: DataFrame, column: String, p: SecretProvider,
      name: String): DataFrame =
    encryptWith(decryptWith(df, column, p, name), column, p, name)

  // no backslashes: the same literal parses identically as a Scala string,
  // a Spark SQL string, and a DuckDB string ([.] and [+] replace \. and \+)
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private[graft] val phoneRe = "[+]1-555-[0-9]{4}"

  /** PII scrubbing over the documents corpus: the curation step that
    * removes contact identifiers before text enters a training mix. The
    * synthetic corpus carries no PII, so the query injects a
    * deterministic contact line per doc (1–2 emails keyed on doc_id, one
    * phone), scrubs with the redaction regexes, and reports per-doc found
    * counts plus residual-leak audit flags (which must be zero — the
    * audit IS the point of the query). Narrow per-row regex maps, all
    * codegen'd built-ins: embarrassingly parallel at 100 TB.
    */
  private def piiScrub(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    documents(s, d)
      .withColumn("pii_text", concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" cc admin"), col("doc_id").cast("string"),
            lit("@mail.example.org"))).otherwise(lit("")),
        lit(" or call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      // graft_pii_scrub fuses the two regexp_replace passes and the two
      // original-text audit counters into ONE combined scan + one output
      // string build (the two-pass form re-scanned pii_text five times
      // and built two intermediate strings). Byte/count equivalence to
      // the two-pass + graft_re_count form is argued in ScrubKernel's
      // scaladoc for this pattern pair and pinned by OptimizedRewriteSpec
      // (corpus + adversarial email/phone overlap strings).
      .withColumn("sc",
        expr(s"graft_pii_scrub(pii_text, '$emailRe', '[EMAIL]', '$phoneRe', '[PHONE]')"))
      .select(
        col("doc_id"),
        col("sc.n1").as("emails_found"),
        col("sc.n2").as("phones_found"),
        (instr(col("sc.scrubbed"), "@") > 0).cast("int").as("residual_email"),
        // the residual audit's POINT is scanning the scrubbed output
        expr(s"graft_re_count(sc.scrubbed, '$phoneRe')").as("residual_phone"))
      .orderBy("doc_id")
  }

  /** k-anonymity audit over the quasi-identifier pair (nation, market
    * segment): groups smaller than k=50 are re-identification risks a
    * release gate must suppress or generalize. One partial+final hash
    * aggregation on the quasi-identifier key — the same single-shuffle
    * shape as any groupBy, so the audit costs one pass at any scale.
    */
  private def kAnonymity(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < 50)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mask_sensitive" -> maskSensitive _,
    "q_k_anonymity"    -> kAnonymity _,
    "q_pii_scrub"      -> piiScrub _,
  )

  val oracle: Map[String, String] = Map(
    "q_mask_sensitive" ->
      """SELECT c_custkey,
        |  'anon-' || substring(sha256(c_name), 1, 16) AS name_token,
        |  'Customer#*****' || right(c_name, 4) AS name_masked,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |HAVING count(*) < 50
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |      || CASE WHEN doc_id % 3 = 0
         |              THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
         |              ELSE '' END
         |      || ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      AS pii_text
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id, pii_text,
         |    regexp_replace(regexp_replace(pii_text, '$emailRe', '[EMAIL]', 'g'),
         |      '$phoneRe', '[PHONE]', 'g') AS scrubbed
         |  FROM p)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(pii_text, '$emailRe')) AS INT) AS emails_found,
         |  CAST(len(regexp_extract_all(pii_text, '$phoneRe')) AS INT) AS phones_found,
         |  CASE WHEN contains(scrubbed, '@') THEN 1 ELSE 0 END AS residual_email,
         |  CAST(len(regexp_extract_all(scrubbed, '$phoneRe')) AS INT) AS residual_phone
         |FROM sc ORDER BY doc_id""".stripMargin,
  )
}
