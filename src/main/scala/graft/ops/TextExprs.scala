package graft.ops

/** Tokenization/shingling expressions shared by Text (near-dup spec) and
  * Dedup (its LSH scale path) — one definition so the two formulations
  * provably tokenize identically, plus the matching DuckDB comprehension.
  */
private[graft] object TextExprs {
  /** Whitespace tokens — identical regex on the Spark and DuckDB side. */
  val toksE = "regexp_extract_all(text, '[^ ]+', 0)"

  /** Distinct 5-gram character shingles (guarded for short docs). */
  val shinglesE =
    "CASE WHEN length(text) >= 5 THEN " +
      "array_distinct(transform(sequence(1, length(text)-4), i -> substring(text, i, 5)))" +
      " ELSE array() END"

  /** The DuckDB-side shingle comprehension (oracle dialect). */
  val shinglesSql =
    "[substring(text, i, 5) FOR i IN range(1, greatest(len(text)-3, 1))]"

  /** Word bigrams over a pre-materialized `toks` array column —
    * NON-distinct (repetition analysis needs the duplicates; dedup wraps
    * this in array_distinct). Callers MUST bind toksE to a named `toks`
    * column first: inlining the regex under the element_at lambda
    * re-runs it per bigram element, turning a linear pass quadratic.
    */
  val bigramsE =
    """transform(sequence(1, size(toks)-1),
      |  i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))""".stripMargin
}
