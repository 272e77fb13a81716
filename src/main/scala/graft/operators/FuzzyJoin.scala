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

  /** Spread an exploding posting join across the cluster (guide §2.5's
    * salt-the-hot-key discipline, made adaptive). The gram-keyed
    * candidate join has TINY input (q·d+1 postings per distinct name)
    * but output f_a(g)·f_b(g) pairs per gram — so AQE, which sizes the
    * post-shuffle stage from its INPUT bytes, coalesces the whole pair
    * explosion onto one task (measured: a 4.8 M-pair verify ran as ONE
    * 7.1 s task at sf0.1; 32 cores idle). Neither AQE skew handling nor
    * more shuffle partitions helps: the explosion is per-KEY, and a
    * single hot gram's block is indivisible under plain hash
    * partitioning.
    *
    * Fix, exact by construction: estimate per-gram pair volume from the
    * two posting dfs (one tiny keyed agg per side), give each gram a
    * split factor s_g = ceil(f_a·f_b / pairsPerTask); the left posting
    * picks ONE salt = hash(name) mod s_g, the right posting replicates
    * s_g ways, and the join keys on (gram, salt) — every (a, b) pair
    * still meets exactly once (under b's replica salt(a)), so emitted
    * rows are bit-identical. Replication cost is Σ_g f_b·s_g ≈
    * pairVolume / pairsPerTask extra posting rows — paid exactly where
    * the explosion is, nothing on cold grams (s_g = 1). Both sides are
    * then repartitioned EXPLICITLY on (gram, salt) to the session's
    * shuffle parallelism — a user-fixed partition count AQE must not
    * coalesce — so the pair generation and the levenshtein verify run
    * wide. Scale-adaptive: split factors derive from the measured dfs
    * and the partition count from the session conf, no constant tuned
    * to this host.
    */
  private def saltExplodingJoin(a: DataFrame, aIdCol: String,
                                b: DataFrame, keys: Seq[String],
                                pairsPerTask: Long = 250000L): DataFrame = {
    val sess = a.sparkSession
    val parts = sess.sessionState.conf.numShufflePartitions
    val fa = a.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__fa"))
    val fb = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__fb"))
    val splits = fa.join(fb, keys)
      .select((keys.map(col) :+
        least(greatest(ceil(col("__fa") * col("__fb") / lit(pairsPerTask.toDouble)),
          lit(1L)), lit(4096L)).cast("int").as("__sg")): _*)
    val aS = a.join(splits, keys)
      .withColumn("__salt",
        pmod(xxhash64(col(aIdCol)), col("__sg").cast("long")).cast("int"))
      .drop("__sg")
    val bS = b.join(splits, keys)
      .withColumn("__salt", explode(expr("sequence(0, __sg - 1)")))
      .drop("__sg")
    val jk = keys :+ "__salt"
    aS.repartition(parts, jk.map(col): _*)
      .join(bS.repartition(parts, jk.map(col): _*), jk)
      .drop("__salt")
  }

  /** Distinct q-grams of a string column. Strings shorter than q have
    * NO grams (empty array) — `sequence(1, len-q+1)` would otherwise
    * run DESCENDING for len < q and fabricate a bogus sub-q "gram", so
    * the short case is gated explicitly. Short strings can never pass
    * the T ≥ 1 exactness gate and refuse upstream anyway.
    */
  private def gramsOf(c: Column, q: Int): Column =
    when(length(c) >= q,
      array_distinct(transform(
        sequence(lit(1), length(c) - (q - 1)),
        i => c.substr(i, lit(q)))))
      .otherwise(array().cast("array<string>"))

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
      // 3-arg (banded) levenshtein: O(maxDist·len) per pair instead of
      // the full O(len²) DP — the verify is the candidate stream's
      // dominant kernel; -1 (= past the threshold) drops in the filter,
      // and within-threshold distances are exact, so emitted rows are
      // identical to the unbounded form (oracle parity preserved)
      .withColumn("dist", levenshtein(col(textCol), col("__ptext"), maxDist))
      .filter(col("dist").between(0, maxDist))
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
    * pairs.
    *
    * Candidate generation is PREFIX-FILTERED (the [[Dedup.ngramJaccard]]
    * PPJoin discipline, Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08):
    * a pair within edit distance d shares ≥ T = max(|Ga|, |Gb|) − q·d
    * distinct grams, and the two-sided prefix lemma (under ANY common
    * total gram order, prefixes of length |G| − T + 1 must intersect
    * when |Ga ∩ Gb| ≥ T) with T ≥ |G| − q·d gives a per-string prefix of
    * at most **q·d + 1 grams**. Ordering grams globally rarest-first
    * (df asc) and indexing ONLY each string's q·d + 1 rarest grams is
    * therefore exact — and keeps frequent grams ("an", "er") out of the
    * inverted index unless a string has nothing rarer, which is what
    * makes both sides of the gram self-join scale: join input is
    * Σ over PREFIX postings of f², not Σ over all grams of f², so hot
    * keys grow with the number of rare-gram collisions, not with corpus
    * cardinality. A length filter (|len_a − len_b| ≤ d ⇒ lev ≥ d
    * otherwise) prunes survivors before the exact `levenshtein` verify.
    *
    * Residual-head df cap: a prefix gram's posting can still be hot if
    * MANY strings have it among their rarest grams (pathology: a corpus
    * of near-identical short codes). `dfCap` bounds that hot key — if
    * any prefix posting exceeds it, `bandShard = "auto"` (default)
    * DEGRADES to the [[joinNames]] length-band shard (exactly the same
    * rows, hot postings split across their holders' length bands, join
    * input doubles — stated on stderr) and only a posting still hot
    * WITHIN one band refuses (a genuinely quadratic same-length head;
    * default cap 100k postings ⇒ ≤ 10^10 pair rows from one gram,
    * already the refuse-don't-run regime). Both sides big ⇒
    * the prefix join SHUFFLES on the gram (no broadcast), the scalable
    * shape; the too-short-strings refusal is unconditional (exactness
    * theorem, not a cost guard).
    * Exact-duplicate (dist 0) cliques are [[Dedup.exact]]'s row, not
    * repeated here.
    */
  def nearDupNames(corpus: DataFrame, textCol: String,
                   maxDist: Int, q: Int = 2,
                   dfCap: Int = 100000, bandShard: String = "auto"): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(Seq("auto", "never", "always").contains(bandShard),
      s"bandShard is 'auto' | 'never' | 'always', got '$bandShard'")
    val names = corpus.groupBy(col(textCol).as("name"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__grams", gramsOf(col("name"), q))
      .withColumn("__ng", size(col("__grams")))
    val tooShort = names.filter(col("__ng") - q * maxDist < 1)
      .select("name").limit(3).collect()
    require(tooShort.isEmpty,
      s"near-dup names: string(s) ${tooShort.mkString(", ")} have too few " +
        s"distinct $q-grams for exact pruning at maxDist=$maxDist")
    // global document frequency per gram over DISTINCT names → the
    // rarest-first canonical order the prefix lemma needs
    val ex = names.select(col("name"), col("__cnt"),
      length(col("name")).as("__len"), explode(col("__grams")).as("__gram"))
    val gramDf = ex.groupBy("__gram").agg(count(lit(1)).as("__df"))
    // prefix postings: each name's q·maxDist + 1 rarest grams (df, gram
    // asc). MIN-K PER NAME AS AN AGGREGATION, not a rank window: a
    // row_number window shuffle-SORTS every (name, gram) row; the
    // hash aggregate collects each name's ≤|name| (df, gram) pairs,
    // sorts them in place and slices the prefix — same rows out
    // (grams are distinct per name; struct sort = (df, gram) asc),
    // measured ~2× cheaper on the posting build
    val prefixLen = q * maxDist + 1
    val prefix = ex.join(gramDf, "__gram")
      .groupBy("name")
      .agg(first("__cnt").as("__cnt"), first("__len").as("__len"),
        slice(array_sort(collect_list(struct(col("__df"), col("__gram")))),
          1, prefixLen).as("__pref"))
      .select(col("name"), col("__cnt"), col("__len"),
        explode(col("__pref")).as("__pg"))
      .select(col("name"), col("__cnt"), col("__len"),
        col("__pg.__gram").as("__gram"))
      // localCheckpoint, NOT persist: the postings are read by the
      // hot-key guard and both sides of the self-join, but a persist
      // here is never unpersistable (the returned frame depends on it)
      // and accumulates cached blocks across repeated calls for the
      // session's lifetime — the Dedup CC-loop discipline instead:
      // checkpoint blocks self-reclaim when the frame is GC'd
      .localCheckpoint(false)
    // residual-head guard: the [[joinNames]] discipline — refuse only
    // when bandShard = 'never'; otherwise degrade to the length-band
    // shard (see joinNames' scaladoc; same exactness argument, with the
    // self-join's name_a < name_b direction preserved)
    val plainHot: Seq[String] =
      if (bandShard == "always") Nil
      else prefix.groupBy("__gram").agg(count(lit(1)).as("__pdf"))
        .filter(col("__pdf") > dfCap).limit(3).collect().map(_.toString).toSeq
    if (bandShard == "never" && plainHot.nonEmpty)
      throw new IllegalArgumentException(
        s"near-dup names: prefix gram posting(s) ${plainHot.mkString(", ")} exceed " +
          s"dfCap=$dfCap — the rarest-gram index still has a quadratic hot key " +
          "on this corpus; raise q, lower maxDist, or pre-split that head " +
          "(bandShard = 'auto' degrades to the length-band shard instead)")
    val a = prefix.select(col("name").as("name_a"), col("__cnt").as("__ca"),
      col("__len").as("__la"), col("__gram"))
    val b = prefix.select(col("name").as("name_b"), col("__cnt").as("__cb"),
      col("__len").as("__lb"), col("__gram"))
    def verify(candidates: DataFrame): DataFrame = candidates
      .filter(col("name_a") < col("name_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select("name_a", "name_b", "__ca", "__cb").distinct()
      // banded levenshtein (see [[join]]): -1 = past the threshold
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist").between(1, maxDist))
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        (col("__ca") * col("__cb")).cast("long").as("n_pairs"))
    if (bandShard != "always" && plainHot.isEmpty)
      verify(saltExplodingJoin(a, "name_a", b, Seq("__gram")))
    else {
      if (plainHot.nonEmpty)
        System.err.println(s"[graft] near-dup names: prefix posting(s) past " +
          s"dfCap=$dfCap — degrading to the length-band shard (band width " +
          s"$maxDist, join input doubles)")
      def banded(s: DataFrame, lenCol: String): DataFrame = s
        .withColumn("__band", floor(col(lenCol) / maxDist))
        .withColumn("__bk", explode(array(col("__band"), col("__band") + 1)))
        .drop("__band")
      val ba = banded(a, "__la")
      val bb = banded(b, "__lb")
      val hot2 = ba.groupBy("__gram", "__bk").agg(count(lit(1)).as("__pdf"))
        .filter(col("__pdf") > dfCap).limit(3).collect()
      require(hot2.isEmpty,
        s"near-dup names: prefix posting(s) ${hot2.mkString(", ")} exceed " +
          s"dfCap=$dfCap WITHIN one length band — a genuinely quadratic " +
          "same-length head; raise q or lower maxDist")
      verify(saltExplodingJoin(ba, "name_a", bb, Seq("__gram", "__bk")))
    }
  }

  /** Fuzzy join where BOTH sides are large — the entity-resolution
    * join between two corpus-scale string sets (no broadcastable side,
    * unlike [[join]]'s serving-probe contract): every pair of DISTINCT
    * strings (one per side) within `maxDist` edits (0..d — exact
    * matches are legitimate resolution output), with the row-pair
    * multiplicity cnt_a · cnt_b. Same collapse-first discipline and
    * the same rarest-gram prefix index as [[nearDupNames]], with the
    * canonical gram order computed over the UNION of both sides'
    * distinct names (the prefix lemma needs ONE common total order
    * across any candidate pair). Each side explodes only its q·d + 1
    * rarest grams, the candidate join SHUFFLES on the gram (the
    * scalable shape), a length filter (|len_a − len_b| ≤ d) prunes
    * before the exact `levenshtein` verify, and the same `dfCap`
    * refusal bounds residual hot prefix postings. Exactness gate as
    * everywhere: strings with ≤ q·d distinct grams refuse loudly.
    *
    * AUTO LENGTH-BAND SHARDING (`bandShard = "auto"`, the default):
    * when a prefix posting exceeds `dfCap`, the join no longer refuses
    * outright — it degrades to the length-band shard the refusal
    * message used to prescribe manually (§15.5's honest statement made
    * an automatic strategy). The theorem: |len_a − len_b| ≤ d, so with
    * bands of width d a matching pair's bands differ by ≤ 1; each
    * side's postings emit under keys (gram, band) AND (gram, band+1)
    * and the join runs on (gram, bandKey) — every pair meets under
    * key max(band_a, band_b) (same-band pairs meet twice; the
    * candidate `distinct()` dedups), so the result is EXACTLY the
    * unsharded rows while the hot gram's posting splits across its
    * holders' length bands. Cost: join-input rows double (each posting
    * carries two keys) — paid only when the cap actually trips, stated
    * loudly on stderr. A posting still past the cap WITHIN one band
    * pair is a genuinely quadratic same-length head — that refusal
    * stays (`"never"` restores refuse-always; `"always"` forces the
    * shard, the spec-equality path).
    */
  def joinNames(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                maxDist: Int, q: Int = 2,
                dfCap: Int = 100000, bandShard: String = "auto"): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(Seq("auto", "never", "always").contains(bandShard),
      s"bandShard is 'auto' | 'never' | 'always', got '$bandShard'")
    def side(df: DataFrame, c: String, out: String, cnt: String): DataFrame =
      df.groupBy(col(c).as(out)).agg(count(lit(1)).as(cnt))
        .withColumn("__grams", gramsOf(col(out), q))
        .withColumn("__ng", size(col("__grams")))
        .withColumn("__len", length(col(out)))
    val na = side(a, aCol, "name_a", "__ca")
    val nb = side(b, bCol, "name_b", "__cb")
    Seq(("left", na, "name_a"), ("right", nb, "name_b")).foreach {
      case (which, n, c) =>
        val tooShort = n.filter(col("__ng") - q * maxDist < 1)
          .select(c).limit(3).collect()
        require(tooShort.isEmpty,
          s"fuzzy joinNames: $which string(s) ${tooShort.mkString(", ")} have too " +
            s"few distinct $q-grams for exact pruning at maxDist=$maxDist")
    }
    // ONE canonical rarest-first order across both sides: df over the
    // union of distinct names (a per-side order would break the lemma
    // for cross pairs)
    val exA = na.select(col("name_a").as("__name"), explode(col("__grams")).as("__gram"))
    val exB = nb.select(col("name_b").as("__name"), explode(col("__grams")).as("__gram"))
    val gramDf = exA.unionByName(exB).groupBy("__gram").agg(count(lit(1)).as("__df"))
    val prefixLen = q * maxDist + 1
    def prefixOf(n: DataFrame, nameCol: String, cnt: String): DataFrame =
      n.select(col(nameCol), col(cnt), col("__len"),
          explode(col("__grams")).as("__gram"))
        .join(gramDf, "__gram")
        // min-k aggregation, not a rank window — see nearDupNames
        .groupBy(nameCol)
        .agg(first(cnt).as(cnt), first("__len").as("__len"),
          slice(array_sort(collect_list(struct(col("__df"), col("__gram")))),
            1, prefixLen).as("__pref"))
        .select(col(nameCol), col(cnt), col("__len"),
          explode(col("__pref")).as("__pg"))
        .select(col(nameCol), col(cnt), col("__len"),
          col("__pg.__gram").as("__gram"))
        // localCheckpoint, not persist — see nearDupNames: the blocks
        // self-reclaim with the frame, so repeated TVF calls don't
        // accumulate session-lifetime cache entries
        .localCheckpoint(false)
    val pa = prefixOf(na, "name_a", "__ca")
    val pb = prefixOf(nb, "name_b", "__cb")
    val plainHot: Seq[(String, Seq[String])] =
      if (bandShard == "always") Nil // the shard runs regardless; skip the probe
      else Seq(("left", pa), ("right", pb)).flatMap { case (which, p) =>
        val hot = p.groupBy("__gram").agg(count(lit(1)).as("__pdf"))
          .filter(col("__pdf") > dfCap).limit(3).collect()
        if (hot.isEmpty) None else Some(which -> hot.map(_.toString).toSeq)
      }
    if (bandShard == "never" && plainHot.nonEmpty)
      throw new IllegalArgumentException(
        s"fuzzy joinNames: prefix gram posting(s) ${plainHot.map { case (w, h) =>
          s"$w ${h.mkString(", ")}" }.mkString("; ")} exceed dfCap=$dfCap — " +
          "raise q, lower maxDist, or pre-split that head (bandShard = 'auto' " +
          "degrades to the length-band shard instead)")
    val aSide = pa.select(col("name_a"), col("__ca"), col("__len").as("__la"), col("__gram"))
    val bSide = pb.select(col("name_b"), col("__cb"), col("__len").as("__lb"), col("__gram"))
    def verify(candidates: DataFrame): DataFrame = candidates
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .select("name_a", "name_b", "__ca", "__cb").distinct()
      // banded levenshtein (see [[join]]): -1 = past the threshold
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist").between(0, maxDist))
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        (col("__ca") * col("__cb")).cast("long").as("n_pairs"))
    if (bandShard != "always" && plainHot.isEmpty)
      verify(saltExplodingJoin(aSide, "name_a", bSide, Seq("__gram")))
    else {
      // length-band shard (see scaladoc): postings keyed by
      // (gram, band) and (gram, band + 1), band width = maxDist
      if (plainHot.nonEmpty)
        System.err.println(s"[graft] fuzzy joinNames: prefix posting(s) past " +
          s"dfCap=$dfCap (${plainHot.map(_._1).mkString("/")} side) — degrading " +
          s"to the length-band shard (band width $maxDist, join input doubles)")
      def banded(s: DataFrame, lenCol: String): DataFrame = s
        .withColumn("__band", floor(col(lenCol) / maxDist))
        .withColumn("__bk", explode(array(col("__band"), col("__band") + 1)))
        .drop("__band")
      val ba = banded(aSide, "__la")
      val bb = banded(bSide, "__lb")
      Seq(("left", ba), ("right", bb)).foreach { case (which, p) =>
        val hot = p.groupBy("__gram", "__bk").agg(count(lit(1)).as("__pdf"))
          .filter(col("__pdf") > dfCap).limit(3).collect()
        require(hot.isEmpty,
          s"fuzzy joinNames: $which prefix posting(s) ${hot.mkString(", ")} exceed " +
            s"dfCap=$dfCap WITHIN one length band — a genuinely quadratic " +
            "same-length head; raise q or lower maxDist")
      }
      verify(saltExplodingJoin(ba, "name_a", bb, Seq("__gram", "__bk")))
    }
  }

  /** Diagnostic for the scale probe: (prefix-join input rows, full-index
    * join input rows) for a corpus — i.e. Σ over prefix postings of f²
    * vs Σ over ALL gram postings of f², the pair volumes the prefix and
    * naive plans respectively push through the gram self-join. Driver
    * metadata only (two tiny aggregates), not a data-path collect.
    */
  def nearDupJoinInputRows(corpus: DataFrame, textCol: String,
                           maxDist: Int, q: Int = 2): (Long, Long) = {
    val names = corpus.groupBy(col(textCol).as("name"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__grams", gramsOf(col("name"), q))
    val ex = names.select(col("name"), explode(col("__grams")).as("__gram"))
    val gramDf = ex.groupBy("__gram").agg(count(lit(1)).as("__df"))
    val prefix = ex.join(gramDf, "__gram")
      .withColumn("__rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("name")
          .orderBy(col("__df"), col("__gram"))))
      .filter(col("__rnk") <= q * maxDist + 1)
    def sumSq(g: DataFrame): Long = g.groupBy("__gram")
      .agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f"))).collect()(0).getLong(0)
    (sumSq(prefix), sumSq(ex))
  }
}
