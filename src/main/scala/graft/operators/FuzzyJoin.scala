package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT fuzzy (edit-distance) matching with q-gram candidate pruning —
  * the record-linkage / entity-resolution primitive (Gravano et al.
  * 2001, "Approximate String Joins in a Database (Almost) for Free"):
  * find every corpus string within Levenshtein distance ≤ d of each
  * probe string, WITHOUT a corpus × probes distance pass.
  *
  * The pruning theorem: one edit touches at most q of a string's
  * q-gram windows, so lev(p, s) ≤ d implies the DISTINCT q-gram sets
  * share at least |G(p)| − q·d elements. Candidates therefore reduce to
  * pairs sharing ≥ T = |G(p)| − q·d grams — an INVERTED-INDEX equi-join
  * on the gram (the [[Dedup]] shape), never an all-pairs plan — and the
  * exact `levenshtein` verify runs only on survivors. Exactness demands
  * T ≥ 1 for every probe; shorter probes (|G(p)| ≤ q·d) would silently
  * lose recall, so they REFUSE loudly instead.
  *
  * Plan shape at 100 TB: the corpus explodes to (gram, id) once and
  * equi-joins the BROADCAST probe grams (probes are the serving-sized
  * side by contract), the shared-gram count is one partial-aggregable
  * groupBy, and the O(len²) Levenshtein kernel prices only the
  * candidate stream — cost tracks match density, not corpus × probes.
  * Both the gram arithmetic and the verify are Spark builtins
  * (codegen'd, no UDF), and `levenshtein` has identical unit-cost
  * semantics in DuckDB, so the whole operator is oracle-checkable.
  */
object FuzzyJoin {

  /** Distinct q-grams of a string column (strings shorter than q have
    * none — they can never pass the T ≥ 1 gate and refuse upstream).
    */
  private def gramsOf(c: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(lit(0), length(c) - (q - 1))),
      i => c.substr(i, lit(q))))

  /** Every (probe, corpus row) pair with `levenshtein ≤ maxDist`.
    * Output: probeIdCol, idCols…, textCol, dist — ties deterministic by
    * construction (exact distances, no sampling).
    */
  def join(corpus: DataFrame, textCol: String, idCols: Seq[String],
           probes: DataFrame, probeTextCol: String, probeIdCol: String,
           maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    // exactness gate: every probe needs |G(p)| - q*d >= 1, else the
    // gram filter could drop a true match — refuse, never degrade
    val pg = probes.select(
      col(probeIdCol), col(probeTextCol).as("__ptext"),
      gramsOf(col(probeTextCol), q).as("__pgrams"))
    val tooShort = pg.filter(size(col("__pgrams")) - q * maxDist < 1)
      .select(probeIdCol).limit(3).collect()
    require(tooShort.isEmpty,
      s"fuzzy join: probe(s) ${tooShort.mkString(", ")} have too few distinct " +
        s"$q-grams for exact pruning at maxDist=$maxDist (need > ${q * maxDist}) — " +
        "shorten q, lower maxDist, or scan-verify those probes separately")
    val probeGrams = pg
      .withColumn("__t", size(col("__pgrams")) - q * maxDist)
      .select(col(probeIdCol), col("__ptext"), col("__t"),
        explode(col("__pgrams")).as("__gram"))
    val corpusGrams = corpus
      .select((idCols.map(col) :+ col(textCol) :+
        explode(gramsOf(col(textCol), q)).as("__gram")): _*)
    // inverted-index equi-join on the gram (probe side broadcast), then
    // the shared-distinct-gram count per pair — both sides' gram lists
    // are distinct, so count(*) IS the intersection size
    val candidates = corpusGrams
      .join(broadcast(probeGrams), Seq("__gram"))
      .groupBy((col(probeIdCol) +: col("__ptext") +: col("__t") +:
        idCols.map(col)) :+ col(textCol): _*)
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= col("__t"))
    candidates
      .withColumn("dist", levenshtein(col(textCol), col("__ptext")))
      .filter(col("dist") <= maxDist)
      .select((col(probeIdCol) +: idCols.map(col)) :+ col(textCol) :+
        col("dist").cast("long").as("dist"): _*)
  }

  /** Fuzzy SELF-join as near-dup REPORT: every pair of DISTINCT corpus
    * strings within 1..maxDist edits, with the row-pair multiplicity
    * (cnt_a · cnt_b) instead of the expanded pairs. The collapse-first
    * discipline of the vector dedup miners applied to strings: a crawl
    * corpus's duplicate cliques make raw pair output quadratic in copy
    * count, while the DISTINCT-string distance matrix is tiny and the
    * clique arithmetic is one multiplication — report clusters, not
    * pairs. Both sides big ⇒ the gram join SHUFFLES on the gram (no
    * broadcast), the scalable shape; same exactness theorem per pair
    * (shared ≥ max(|Ga|, |Gb|) − q·d), same loud refusal for strings
    * too short for it. Exact-duplicate (dist 0) cliques are
    * [[Dedup.exact]]'s row, not repeated here.
    */
  def nearDupNames(corpus: DataFrame, textCol: String,
                   maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val names = corpus.groupBy(col(textCol).as("name"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__grams", gramsOf(col("name"), q))
      .withColumn("__ng", size(col("__grams")))
    val tooShort = names.filter(col("__ng") - q * maxDist < 1)
      .select("name").limit(3).collect()
    require(tooShort.isEmpty,
      s"near-dup names: string(s) ${tooShort.mkString(", ")} have too few " +
        s"distinct $q-grams for exact pruning at maxDist=$maxDist")
    val g = names.select(col("name"), col("__cnt"), col("__ng"),
      explode(col("__grams")).as("__gram"))
    val a = g.select(col("name").as("name_a"), col("__cnt").as("__ca"),
      col("__ng").as("__nga"), col("__gram"))
    val b = g.select(col("name").as("name_b"), col("__cnt").as("__cb"),
      col("__ng").as("__ngb"), col("__gram"))
    a.join(b, Seq("__gram")).filter(col("name_a") < col("name_b"))
      .groupBy("name_a", "name_b", "__ca", "__cb", "__nga", "__ngb")
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= greatest(col("__nga"), col("__ngb")) - q * maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist").between(1, maxDist))
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        (col("__ca") * col("__cb")).cast("long").as("n_pairs"))
  }
}
