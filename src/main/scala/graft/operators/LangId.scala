package graft.operators

import graft.core.Checkpoint.Ops
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed character-n-gram language identification — the DSIR-style
  * upgrade of the marker-lexicon heuristic (`GraftFunctions.langIdFrom`):
  * instead of a handful of marker words per language, each language gets
  * a `dim`-bucket hashed char-trigram count model trained IN-PLAN from
  * labeled text (the corpus's own labels, or any labeled slice), and a
  * document is classified to the language whose model rates its trigrams
  * highest. Trigram models are the standard n-gram-LID construction
  * (Cavnar & Trenkle 1994, public) and discriminate orthography and
  * function-word shape far beyond marker hits.
  *
  * Determinism posture (what makes the gate hash-exact): the per-
  * (doc, language) statistic is the MEAN add-one-smoothed bucket
  * probability, which collapses algebraically to ONE rational —
  * `(n_grams + Σ_grams cnt_{bucket,lang}) / (n_grams · (tot_lang + dim))`
  * — whose numerator is an ORDER-INDEPENDENT integer sum. No sequential
  * double fold is needed at all (unlike the DSIR ratio, whose summands
  * have varying denominators); the single final division and the shared
  * per-language denominator multiply run in double with one fixed shape
  * on both engines. Argmax ties break to the lexicographically smallest
  * language.
  *
  * 100 TB shape: the model is `dim` rows × |langs| integer columns plus a
  * 1-row totals aggregate, both broadcast; the corpus pays one explode
  * and ONE doc-keyed integer aggregation (map-side partial). The integer
  * numerator means the aggregation state is |langs| longs per doc — no
  * per-doc gram buffer. The denominator multiply runs in DOUBLE, so
  * `n_grams · tot_lang` cannot overflow at corpus scale.
  */
object LangId {

  /** Classify every document. `langs` is the closed label set (sorted
    * internally so tie-breaks are stable); training labels come from
    * `langCol` of the SAME frame (self-training on the corpus's labels,
    * the DSIR convention; pass a curated slice for a cleaner model).
    * Output: (doc_id, lang, pred_lang). */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      langs: Seq[String],
      dim: Int = 256): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two for the unsigned-mod bucket identity, got $dim")
    require(langs.size >= 2 && langs.distinct == langs,
      "langs must be >= 2 distinct labels")
    GraftFunctions.register(docs.sparkSession)
    val ls = langs.sorted

    // norm MUST be bound as its own projection before the n-gram window:
    // embedding the regexp-based normalize inside a per-gram expression
    // would re-evaluate it PER GRAM — measured 25s vs ~2s for this gate
    // at sf0.1. A non-cheap alias referenced many times is not inlined
    // by CollapseProject (the curation-kernel rule). The gram stream
    // itself is explode(sequence) + substring — plain codegen'd
    // expressions, NOT a higher-order transform lambda (HOFs run
    // interpreted): semantically identical to charNgrams(norm, 3)
    // including the short-string edge (len ≤ 3 → one gram = the string,
    // since greatest(1, len−2) = 1 and substr clamps).
    val feats = docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        GraftFunctions.normalize(col(textCol)).as("norm"))
      .select(col("doc_id"), col("lang"), col("norm"),
        explode(sequence(lit(1), greatest(lit(1), length(col("norm")) - 2))).as("i"))
      .select(col("doc_id"), col("lang"),
        pmod(GraftFunctions.fingerprint64(
          col("norm").substr(col("i"), lit(3))), lit(dim.toLong)).as("b"))

    // model: dim rows, one integer trigram count column per language —
    // materialized once (eager graftCheckpoint, dim rows) so the totals
    // aggregate and the broadcast join read the dim-row table instead of
    // each re-running the corpus explode
    val cnts = ls.map(l =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_$l"))
    val model = feats.groupBy(col("b")).agg(cnts.head, cnts.tail: _*)
      .graftCheckpoint()
    val tots = ls.map(l => sum(col(s"c_$l")).as(s"t_$l"))
    val totals = model.agg(tots.head, tots.tail: _*)

    // per doc: n_grams + per-language numerator sums — pure integer agg
    val sums = count(lit(1)).as("n_g") +:
      ls.map(l => sum(coalesce(col(s"c_$l"), lit(0L))).as(s"s_$l"))
    val perDoc = feats.join(broadcast(model), Seq("b"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sums.head, sums.tail: _*)

    val scoreCols = ls.map { l =>
      ((col("n_g") + col(s"s_$l")).cast("double") /
        (col("n_g").cast("double") *
          (col(s"t_$l") + lit(dim.toLong)).cast("double"))).as(s"score_$l")
    }
    val scored = perDoc.crossJoin(broadcast(totals))
      .select(col("doc_id") +: col("lang") +: scoreCols: _*)
    val mx = greatest(ls.map(l => col(s"score_$l")): _*)
    // coalesce over the sorted when-chain = lexicographic tie-break
    val pred = coalesce(ls.map(l => when(col(s"score_$l") === mx, lit(l))): _*)
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
  }
}
