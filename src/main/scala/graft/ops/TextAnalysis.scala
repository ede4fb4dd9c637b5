package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (extension surface;
  * driven by the `documents` testdata table).
  *
  * Everything is built-in `functions._` over tokens from `split` — fully
  * codegen'd per-row work with no shuffle, so these scale linearly with
  * document count at 100 TB (the scan is the only cost; filters/projections
  * push down around them).
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Small language-marker lists. Deliberately tiny + disjoint so the
    * heuristic is deterministic and oracle-expressible in plain SQL. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
  )

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language-ID by marker-word counts; argmax with fixed precedence order
    * (en > es > de > fr on ties), 'und' (undetermined) when no marker hits.
    * N-gram-free heuristic — counts are one pass over the token array. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = markers.map { case (lang, ws) => lang -> hits(toks, ws) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), acc) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality metrics: length, token counts, distinct ratio, stopword ratio,
    * mean token length. All ratios rounded for cross-engine comparison. */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val enStops = markers.head._2
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nTok.as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      round(size(array_distinct(toks)).cast("double") / nTok, 4).as("distinct_ratio"),
      round(hits(toks, enStops).cast("double") / nTok, 4).as("stopword_ratio"),
      round((length(col(textCol)) - nTok + 1).cast("double") / nTok, 4)
        .as("avg_token_len"))
  }

  /** Whitespace token count + a BPE-ish subword proxy: counts of 4-char
    * chunks (ceil(len/4) per token), a deterministic stand-in for a BPE
    * tokenizer's piece count. */
  /** GPT-2-style pre-tokenizer pattern, restricted to the Java/RE2
    * common subset (no lookarounds, no unicode categories) so the DuckDB
    * oracle segments identically: letter runs, 1-3 digit groups,
    * punctuation runs, whitespace runs. */
  val bpePattern = "[a-zA-Z]+|[0-9]{1,3}|[^a-zA-Z0-9\\s]+|\\s+"

  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      size(toks).as("n_ws_tokens"),
      // cheap budget heuristic (~4 chars/subword), no second regex pass
      aggregate(toks, lit(0L),
        (acc, t) => acc + ceil(length(t).cast("double") / 4).cast("long"))
        .as("n_subword_est"),
      // regex segmentation count — the BPE-shaped budget a packing stage
      // plans against (one codegen'd regexp pass per row)
      size(regexp_extract_all(col(textCol), lit(bpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))
  }

  /** Token-window chunking — split each document into overlapping
    * fixed-size token windows (the pack-into-context-window step of a
    * training pipeline). Chunks start every `chunkSize - overlap` tokens;
    * the last chunk is short rather than dropped (no token is lost), and
    * a doc shorter than `chunkSize` yields exactly one chunk.
    *
    * Pure per-row explode — one `sequence` of start offsets +
    * `posexplode` + `slice`, all codegen'd builtins, no shuffle: output
    * volume is input volume × (1 + overlap share), which is the floor for
    * this op at any scale. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), posexplode(
        sequence(lit(0), greatest(size(col("t")) - 1, lit(0)), lit(step))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        array_join(slice(col("t"), col("col") + 1, lit(chunkSize)), " ").as("chunk"),
        least(lit(chunkSize), size(col("t")) - col("col")).cast("long")
          .as("n_tokens"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * order-insensitive document identity (bag-of-words fingerprint).
    * Portable across engines (md5 of utf8), so oracle-checkable. */
  def contentFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Rolling polynomial hash over the token sequence (order-sensitive
    * fingerprint): acc = acc*31 + xxhash64(token), wrapping long
    * arithmetic. Engine-native (xxhash64) — verified by ScalaTest, not
    * the SQL oracle. */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc * 31L + xxhash64(t))

  /** Top-k terms per document by TF-IDF (keyword extraction — the
    * training-data-prep step behind topic filters and per-doc summaries).
    * tf = in-doc term count; idf = ln(N / docfreq); score rounded to 4
    * decimals so the cross-engine ln/multiply wobble can't move a rank
    * (term ASC tie-break makes the top-k total-ordered).
    *
    * Scale shape: explode → (doc, term) count is one shuffle with map-side
    * combine; doc-frequency is a second, smaller aggregate over the
    * (doc, term) pairs; N rides a broadcast 1-row aggregate (NO eager
    * count — plan construction runs zero jobs). The score join shuffles
    * on term; the final top-k is a rank with WindowGroupLimit
    * pre-reduction. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("docfreq"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("docfreq")), 4).as("tfidf"))
    Windows.topKPerGroup(scored, Seq(col("doc_id")),
      Seq(col("tfidf").desc, col("term").asc), k)
  }
}
