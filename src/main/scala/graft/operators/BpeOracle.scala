package graft.operators

/** DuckDB oracle SQL for the BPE family (q131 learn / q133 apply / q137
  * packed token IDs): the byte-pair-encoding TRAINING loop unrolled as K
  * chained, MATERIALIZED CTE stages, so even the iterative argmax is
  * independently recomputed by the oracle engine — no learned literal is
  * smuggled from the Spark side.
  *
  * Representation: each word is a symbol string with every symbol wrapped
  * in US (unit-separator, chr(31)) sentinels — `␟s1␟␟s2␟…` — so applying
  * merge (l, r) is one `replace('␟l␟␟r␟' -> '␟lr␟')`. DuckDB's `replace`
  * scans left-to-right and resumes AFTER each replacement, which is
  * exactly the greedy non-overlapping semantics of the engine's
  * [[Prep.applyMerge]] fold ('a a a' merges to [aa, a], never [a, aa];
  * a symbol merged this pass cannot re-merge). The wrap makes adjacent
  * pair patterns character-disjoint, so shared-separator undercounting
  * ('a a a a' must yield [aa, aa]) cannot occur. Sort parity: DuckDB
  * ORDER BY on VARCHAR is binary UTF-8 — the same order as Spark's
  * UTF8String and [[Prep.utf8Lt]] — so argmax tie-breaks agree.
  *
  * Each stage is MATERIALIZED because v_i references v_{i-1} both through
  * the pair-count argmax m_i and through its own projection: without
  * materialization the CTE tree re-expands the whole prefix per reference
  * (exponential plan blowup by depth 16).
  */
private[operators] object BpeOracle {

  private val S = "chr(31)"
  private val S2 = "chr(31)||chr(31)"

  /** CTE chain `words, v0, m1, v1, …, mK, vK, merges`:
    * `words(w, wc)` distinct corpus words with counts; `vI(w, s, wc)` the
    * wrapped symbol string after the first I merges; `mI(l, r, c)` the
    * step-I argmax pair (count desc, then (l, r) in binary UTF-8 order);
    * `merges(step, l, r, c)` the learned list.
    */
  def ctes(k: Int): String = {
    val sb = new StringBuilder
    // PRECONDITION (verified clean on current testdata, asserted here so a
    // regenerated corpus can't silently break parity): no word may contain
    // chr(31) — it IS the symbol sentinel, a literal one collides with the
    // wrapping — or chr(10) — RE2's '(.)' skips \n, leaving it unwrapped.
    // The CASE makes DuckDB raise via error() instead of hash-mismatching.
    sb.append(s"""words AS MATERIALIZED (
      |  SELECT CASE WHEN strpos(w, $S) > 0 OR strpos(w, chr(10)) > 0
      |              THEN error('BPE oracle precondition: corpus word ' ||
      |                         'contains chr(31) or newline')
      |              ELSE w END AS w, wc
      |  FROM (
      |    SELECT w, CAST(count(*) AS BIGINT) AS wc
      |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) u
      |    WHERE w <> '' GROUP BY w) g),
      |v0 AS MATERIALIZED (
      |  SELECT w, regexp_replace(w, '(.)', $S || '\\1' || $S, 'g') AS s, wc
      |  FROM words)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |m$i AS MATERIALIZED (
        |  SELECT z.pr[1] AS l, z.pr[2] AS r, CAST(sum(z.wc) AS BIGINT) AS c
        |  FROM (SELECT unnest(list_zip(syms, syms[2:])) AS pr, wc
        |        FROM (SELECT string_split(trim(s, $S), $S2) AS syms, wc
        |              FROM v$p) sp) z
        |  WHERE z.pr[2] IS NOT NULL GROUP BY 1, 2
        |  ORDER BY c DESC, l, r LIMIT 1),
        |v$i AS MATERIALIZED (
        |  SELECT v.w, replace(v.s, $S || m.l || $S || $S || m.r || $S,
        |                      $S || m.l || m.r || $S) AS s, v.wc
        |  FROM v$p v, m$i m)""".stripMargin)
    }
    val union = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS step, l, r, c FROM m$i")
      .mkString("\n  UNION ALL ")
    sb.append(s""",
      |merges AS MATERIALIZED (
      |  $union)""".stripMargin)
    sb.toString
  }

  /** q131: the learned merge list itself. */
  def q131Sql(k: Int): String =
    s"""WITH ${ctes(k)}
       |SELECT step, l AS "left", r AS "right", c AS pair_count
       |FROM merges ORDER BY step""".stripMargin

  /** q133: per-doc whitespace-word and exact subword counts under the
    * learned merges (subwords per word = symbol count of vK's string).
    */
  def q133Sql(k: Int): String =
    s"""WITH ${ctes(k)},
       |sub AS (SELECT w,
       |          CAST(len(string_split(trim(s, $S), $S2)) AS BIGINT) AS n_sub
       |        FROM v$k),
       |docw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |         FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       |  round(CAST(sum(n_sub) AS DOUBLE) / count(*), 4) AS subwords_per_word
       |FROM (SELECT * FROM docw WHERE w <> '') dw JOIN sub USING (w)
       |GROUP BY doc_id""".stripMargin

  /** Token-ID vocabulary CTEs over the learned merges — the ID convention
    * of [[Prep.wordTokenIds]]: id 0 is the inter-word separator, base
    * characters take 1..C in binary UTF-8 order, merge step i takes C+i;
    * a string produced by two different merge steps keeps its smallest id.
    * `wids(w, ids)` maps each distinct word to its subword-ID array.
    */
  def idCtes(k: Int): String =
    s"""chars AS MATERIALIZED (
       |  SELECT DISTINCT unnest(string_split(w, '')) AS sym FROM words),
       |nchars AS (SELECT CAST(count(*) AS BIGINT) AS n FROM chars),
       |vocab AS MATERIALIZED (
       |  SELECT sym, CAST(min(id) AS BIGINT) AS id FROM (
       |    SELECT sym, row_number() OVER (ORDER BY sym) AS id FROM chars
       |    UNION ALL
       |    SELECT l || r AS sym, (SELECT n FROM nchars) + step AS id
       |    FROM merges) z
       |  GROUP BY sym),
       |wsyms AS (
       |  SELECT w, unnest(syms) AS sym, unnest(range(1, len(syms) + 1)) AS i
       |  FROM (SELECT w, string_split(trim(s, $S), $S2) AS syms FROM v$k) q2),
       |wids AS MATERIALIZED (
       |  SELECT w, array_agg(v.id ORDER BY i) AS ids
       |  FROM wsyms JOIN vocab v USING (sym) GROUP BY w)""".stripMargin
}
