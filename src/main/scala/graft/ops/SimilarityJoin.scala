package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Det

/** Token-set similarity joins, Spark-first.
  *
  * The classic MapReduce formulation (Vernica/Carey/Li, SIGMOD 2010:
  * tokenize → global token ordering → inverted-index candidate generation →
  * verification; prefix/length filters from PPJoin, Xiao et al. WWW 2008 and
  * SSJoin, Chaudhuri et al. ICDE 2006) maps onto Spark as a declarative
  * DataFrame plan: explode → equi-join on (block keys, token) → hash
  * aggregation. Catalyst plans the candidate join as a shuffled hash /
  * sort-merge join keyed on the composite (block, token) key, which is the
  * same data movement as the MR inverted index but with whole-stage codegen
  * and AQE skew handling for free.
  *
  * Scale notes (100 TB):
  *  - candidate generation shuffles on (block…, token): high-frequency
  *    tokens are the skew risk. `jaccardSelfPrefix` indexes only the
  *    (|x| − ⌈τ·|x|⌉ + 1)-token prefix in ascending global-document-frequency
  *    order, which removes exactly the most frequent tokens from the index —
  *    simultaneously the correctness-preserving prune and the skew killer.
  *  - the group-by that counts intersections re-shuffles on (a_id, b_id);
  *    partial aggregation (Spark always plans partial+final hash agg) keeps
  *    the shuffle proportional to distinct candidate pairs, not candidate
  *    token matches.
  *  - nothing touches the driver: no collect, no broadcast of anything
  *    unbounded (the token→df relation broadcasts only below
  *    [[SimilarityJoin.MaxBroadcastVocab]] rows; an open vocabulary is
  *    dispatched to a shuffle equi-join — the plan is otherwise unchanged).
  *  - no global single-partition window anywhere: the q35 rank is computed
  *    per-df with broadcast offsets from the tiny df-histogram.
  */
object SimilarityJoin {

  /** Max vocabulary rows the element-frequency relation may hold and still
    * be broadcast. 4M rows of (token, df) is comfortably inside the default
    * driver/executor budget; an open 100 TB vocabulary is not.
    */
  val MaxBroadcastVocab: Long = 4L << 20

  /** Join an exploded (…, `key`) relation with its element-frequency
    * relation, dispatching on vocabulary size: broadcast when the
    * vocabulary is provably small, plain shuffle equi-join otherwise.
    *
    * `forceBroadcast`: `Some(b)` skips the probe (callers at scale know
    * their vocabulary); `None` auto-probes with a bounded `limit(max+1)
    * .count()` — the limit caps the probe's work regardless of true
    * vocabulary size, at the cost of one extra bounded pass over the
    * aggregation (at 100 TB pass `Some(false)` instead and skip it).
    */
  private[graft] def freqJoined(exploded: DataFrame, freq: DataFrame, key: String,
                                forceBroadcast: Option[Boolean],
                                joinType: String = "inner"): DataFrame = {
    val small = forceBroadcast.getOrElse(
      freq.limit((MaxBroadcastVocab + 1).toInt).count() <= MaxBroadcastVocab)
    if (small) exploded.join(broadcast(freq), Seq(key), joinType)
    else exploded.join(freq, Seq(key), joinType)
  }

  /** Tokenize + dedupe: adds `tokens` (distinct) and `sz` columns. */
  def tokenized(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("tokens", array_distinct(split(col(textCol), " +")))
      .withColumn("sz", size(col("tokens")))

  /** Hash-distribute on the given keys with an EXPLICIT partition count.
    * The input to a candidate join is often tiny (its fan-out is what's
    * huge), so AQE would coalesce a plain repartition back toward one
    * partition and serialize the probe; an explicit count pins the
    * parallelism to the session's shuffle width.
    */
  private def spread(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, keys: _*)
  }

  /** FP-robust similarity length bound: τ·|A| ≤ |B| must not drop a true
    * pair when |A|·τ is mathematically integral but rounds up in IEEE, so
    * the prune side gets a tiny epsilon of slack (pruning less is always
    * safe — verification is exact).
    */
  private def lenOk(aSz: Column, bSz: Column, tau: Double): Column =
    aSz * lit(tau) - lit(1e-9) <= bSz && bSz * lit(tau) - lit(1e-9) <= aSz

  /** Exact token-set Jaccard self-join.
    *
    * Pairs (a, b) with a.id < b.id, equal block keys, and
    * J(A, B) = |A∩B| / |A∪B| ≥ tau. Output: (a_id, b_id, sim ROUND 6),
    * totally ordered by (a_id, b_id).
    *
    * Plan shape: one shuffle for the (block, token) candidate join, one for
    * the pair-count aggregation. The length filter (J ≥ τ ⇒ τ·|B| ≤ |A|)
    * prunes candidates before the aggregate. Indexes EVERY token — exact
    * and simple, but skew-prone on a Zipfian vocabulary; prefer
    * [[jaccardSelfPrefix]] at scale, or [[jaccardSelfAuto]] to let a probe
    * choose.
    */
  def jaccardSelf(docs: DataFrame, idCol: String, textCol: String,
                  blockCols: Seq[String], tau: Double): DataFrame =
    jaccardSelfOnSets(tokenized(docs, textCol), idCol, "tokens", blockCols, tau)

  /** Vocabulary-skew probe: max(df) / avg(df) over the token-frequency
    * relation. ≈1 on a flat vocabulary (every token similarly common — no
    * hot token drives the candidate join, and the prefix filter has nothing
    * to prune, so the plain inverted index wins); large on a Zipfian
    * vocabulary (a few hot tokens dominate candidate generation — exactly
    * the tokens the prefix filter refuses to index). One linear
    * explode+agg pass with a two-value result — cheap relative to the join
    * it plans; at 100 TB skip it by passing an explicit choice instead.
    */
  def vocabSkew(sets: DataFrame, setCol: String): Double = {
    val r = sets.select(explode(col(setCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .agg(max(col("df")).cast("double").as("mx"), avg(col("df")).as("av"))
      .collect()(0)
    if (r.isNullAt(0) || r.getDouble(1) == 0.0) 1.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Skew ratio at which the prefix-filtered plan takes over. Measured on
    * this corpus (flat 31-token vocabulary, skew ≈ 1.15): exact 1.4 s vs
    * prefix 2.3 s at sf0.1 — below the threshold the prefix only pays its
    * extra sort+dedup. On a synthetic hot-token corpus (skew ≫ 8) the full
    * index's hot-token candidate blowup dwarfs the prefix overhead.
    */
  val PrefixSkewThreshold: Double = 8.0

  /** Skew ratio at which even the PREFIX index's candidate join gets salted.
    * The prefix filter drops each record's most frequent tokens from the
    * index, but on an extreme-skew corpus (near-duplicate-heavy: many
    * records share their rarest tokens too) the surviving prefix tokens are
    * still hot enough that one reducer owns most candidate pairs. AQE's
    * skew split cannot help — the candidate join feeds the pair aggregation
    * inside one stage — so the join is routed through
    * [[Salting.saltedEquiJoin]], spreading each hot (token, block) key over
    * [[CandidateSalts]] reducers at the cost of replicating the build-side
    * index that many times.
    */
  val SaltSkewThreshold: Double = 64.0

  /** Salt fan-out for the extreme-skew candidate join: build-side shuffle
    * volume scales linearly with it, hot-reducer width inversely — 8 spreads
    * a hot key across a quarter of a 32-slot stage without tripling the
    * index shuffle.
    */
  val CandidateSalts: Int = 8

  /** Probe-dispatched exact Jaccard self-join — the deployment default the
    * q36 scaladoc promises: [[vocabSkew]] picks [[jaccardSelf]] (flat
    * vocabulary) or [[jaccardSelfPrefix]] (Zipfian), both exact and
    * property-tested equivalent, so the choice affects only the plan; at
    * extreme skew (≥ [[SaltSkewThreshold]]) the prefix plan's candidate
    * join is additionally salted ([[Salting.saltedEquiJoin]]).
    * `usePrefix` / `saltCandidates`: `Some(b)` skips the probe (callers at
    * scale know their vocabulary shape — pass BOTH to skip it entirely).
    */
  def jaccardSelfAuto(docs: DataFrame, idCol: String, textCol: String,
                      blockCols: Seq[String], tau: Double,
                      usePrefix: Option[Boolean] = None,
                      saltCandidates: Option[Boolean] = None,
                      sorted: Boolean = true): DataFrame = {
    val sets = tokenized(docs, textCol)
    lazy val skew = vocabSkew(sets, "tokens")
    val prefix = usePrefix.getOrElse(skew >= PrefixSkewThreshold)
    val salted = prefix && saltCandidates.getOrElse(skew >= SaltSkewThreshold)
    if (prefix) jaccardSelfPrefixOnSets(sets, idCol, "tokens", blockCols, tau,
      nSalts = if (salted) CandidateSalts else 1, sorted = sorted)
    else jaccardSelfOnSets(sets, idCol, "tokens", blockCols, tau, sorted = sorted)
  }

  /** Exact set-Jaccard self-join over an arbitrary precomputed array column
    * (distinct elements) — the generic core behind [[jaccardSelf]] (word
    * tokens) and the char-n-gram join (gram sets). Same inverted-index +
    * length-filter plan.
    */
  /** `sorted = false` (r20 optimization round) skips the final global
    * ORDER BY for consumers that immediately re-aggregate or re-key the
    * pairs (graph closures, anti-joins): those callers eagerly materialize
    * the pair relation (GraphOps checkpoints its edge input), which would
    * otherwise execute a range exchange + full sort whose order the
    * consumer then destroys. Row SET is identical; only presentation order
    * is dropped.
    */
  def jaccardSelfOnSets(sets: DataFrame, idCol: String, setCol: String,
                        blockCols: Seq[String], tau: Double,
                        sorted: Boolean = true): DataFrame = {
    val toks = sets
      .select(col(idCol).as("id") +: size(col(setCol)).as("sz") +:
        col(setCol).as("tokens") +: blockCols.map(col): _*)

    val inv = toks
      .select(col("id") +: col("sz") +: blockCols.map(col) :+ explode(col("tokens")).as("tok"): _*)

    val a = inv.select(col("id").as("a_id") +: col("sz").as("a_sz") +: col("tok") +:
      blockCols.map(c => col(c).as(s"a_$c")): _*)
    val b = inv.select(col("id").as("b_id") +: col("sz").as("b_sz") +: col("tok").as("b_tok") +:
      blockCols.map(c => col(c).as(s"b_$c")): _*)

    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
    val cond = ((col("tok") === col("b_tok")) +: blockEq).reduce(_ && _) &&
      col("a_id") < col("b_id") &&
      lenOk(col("a_sz"), col("b_sz"), tau)

    // Spread the probe side across the cluster before the candidate join:
    // a single-file scan would otherwise leave a broadcast join probing on
    // one partition — serial candidate generation no matter how many cores.
    // Hash-distributing on (token, blocks) is also exactly the layout the
    // pair join wants.
    val aDist = spread(a, col("tok") +: blockCols.map(c => col(s"a_$c")))

    aDist.join(b, cond)
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("sim",
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
      .filter(col("sim") >= tau)
      .select(col("a_id"), col("b_id"), Det.round6(col("sim")).as("sim"))
      .maybeOrdered(sorted, "a_id", "b_id")
  }

  /** Conditional total order — see [[jaccardSelfOnSets]]'s `sorted` note. */
  private implicit class MaybeOrdered(private val df: DataFrame) {
    def maybeOrdered(sorted: Boolean, cols: String*): DataFrame =
      if (sorted) df.orderBy(cols.map(col): _*) else df
  }

  /** Exact token-set Jaccard R-S join: each row of `queries` against each
    * row of `data` with equal block keys, excluding identical ids,
    * J ≥ tau. Output (q_id, d_id, sim) totally ordered.
    */
  def jaccardRS(queries: DataFrame, data: DataFrame, idCol: String, textCol: String,
                blockCols: Seq[String], tau: Double): DataFrame = {
    def side(df: DataFrame, p: String) =
      tokenized(df, textCol)
        .select(col(idCol).as(s"${p}_id") +: col("sz").as(s"${p}_sz") +:
          col("tokens") +: blockCols.map(col): _*)
        .select(col(s"${p}_id") +: col(s"${p}_sz") +:
          blockCols.map(c => col(c).as(s"${p}_$c")) :+ explode(col("tokens")).as(s"${p}_tok"): _*)

    val q = side(queries, "q")
    // the data side is the probe (the query side is the natural build/
    // broadcast side); spread it so a single-file scan can't serialize
    // candidate generation — see [[spread]]
    val d = spread(side(data, "d"), col("d_tok") +: blockCols.map(c => col(s"d_$c")))
    val blockEq = blockCols.map(c => col(s"q_$c") === col(s"d_$c"))
    val cond = ((col("q_tok") === col("d_tok")) +: blockEq).reduce(_ && _) &&
      col("q_id") =!= col("d_id") &&
      lenOk(col("q_sz"), col("d_sz"), tau)

    d.join(q, cond)
      .groupBy(col("q_id"), col("d_id"), col("q_sz"), col("d_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("sim",
        col("inter").cast("double") / (col("q_sz") + col("d_sz") - col("inter")).cast("double"))
      .filter(col("sim") >= tau)
      .select(col("q_id"), col("d_id"), Det.round6(col("sim")).as("sim"))
      .orderBy("q_id", "d_id")
  }

  /** Word n-gram shingles: adds `shingles` (distinct, space-joined,
    * first-occurrence order) and `sh_sz`; fewer than `n` tokens → empty
    * set. One codegen'd kernel call per row
    * ([[graft.functions.SetOps.shingles]]) — the
    * transform/concat_ws/array_distinct HOF formulation it replaced ran
    * interpreted per SHINGLE and dominated the q60 join's cost (equality
    * of the two forms is pinned in SigExprsSpec).
    */
  def shingled(df: DataFrame, textCol: String, n: Int): DataFrame = {
    graft.functions.SetExprs.register(df.sparkSession)
    df.withColumn("shingles", graft.functions.SetExprs.shinglesCol(
        split(col(textCol), " +"), lit(n)))
      .withColumn("sh_sz", size(col("shingles")))
  }

  /** Containment R-S join — the decontamination primitive: for each QUERY
    * document (an eval/benchmark item), every data document containing at
    * least `tau` of the query's word `n`-gram shingles.
    * C(Q, D) = |S(Q) ∩ S(D)| / |S(Q)| — asymmetric by design: a test item
    * fully quoted inside a long training document scores 1.0 where Jaccard
    * would vanish, which is exactly why decontamination uses containment.
    *
    * Plan (prefix-filtered since r6 — the hot-shingle fanout of the naive
    * full inverted join measured 10.1 s at sf0.1, prefix form ~1 s):
    * candidate generation explodes only each query's RAREST
    * |S(Q)| − ⌈τ·|S(Q)|⌉ + 1 shingles (ascending data-side df; the overlap
    * bound o ≥ ⌈τ·|S(Q)|⌉ guarantees any qualifying D shares at least one
    * prefix shingle — the standard overlap-prefix lemma applied to the Q
    * side, which is the only side containment constrains), equi-joined
    * against the full data-side shingle index. Exact verification then
    * recomputes |S(Q) ∩ S(D)| on the carried arrays, so the prefix is a
    * pure candidate filter. Output (q_id, d_id, contain ROUND 6), totally
    * ordered.
    */
  /** Max query-side rows the containment join may broadcast: eval sets are
    * small by the operator's nature, but the broadcast is still GATED by a
    * bounded probe (the r3 `broadcast(freq)` lesson: never broadcast on an
    * assumption) — an over-bound query side dispatches to shuffle joins.
    */
  val MaxBroadcastQueries: Long = 100000L

  /** Decontamination against an ARBITRARY eval-set relation: the query side
    * names its own id/text columns (any schema, any id type — an eval
    * benchmark table, not a corpus derivative), scored for shingle
    * containment inside `data`. Because the two relations have distinct
    * provenance, no self-exclusion applies — `containmentRS`'s
    * `q_id ≠ d_id` guard is meaningless across heterogeneous id types (a
    * string-vs-long comparison coerces to NULL and would silently drop
    * every pair), so this form omits it; use [[containmentRS]] when the
    * eval items are derived from the corpus itself. Output
    * (q_id, d_id, contain ROUND 6) with q_id/d_id keeping their input
    * types; blocks, plan shape, and broadcast gating identical to
    * [[containmentRS]].
    */
  def containmentRSGeneral(queries: DataFrame, qIdCol: String, qTextCol: String,
                           data: DataFrame, dIdCol: String, dTextCol: String,
                           blockCols: Seq[String], tau: Double, n: Int = 3,
                           queriesBroadcast: Option[Boolean] = None): DataFrame = {
    val qNorm = queries.select(col(qIdCol).as("__cid") +:
      col(qTextCol).as("__ctext") +: blockCols.map(col): _*)
    val dNorm = data.select(col(dIdCol).as("__cid") +:
      col(dTextCol).as("__ctext") +: blockCols.map(col): _*)
    containmentRS(qNorm, dNorm, "__cid", "__ctext", blockCols, tau, n,
      queriesBroadcast, excludeSelf = false)
  }

  /** The data-side shingle index `containmentRS` rebuilds per call, as a
    * first-class value: `docs` = (d_id, d_shingles, d_<block>…) spread by
    * d_id, `freq` = (sh, df). At 100 TB the data-side index is the dominant
    * recurring cost across eval sets — build it ONCE (then `.persist()` or
    * write both relations to parquet and reconstruct the case class from
    * the reads), and run every decontamination pass through
    * [[containmentRSIndexed]] against the same materialization.
    */
  final case class ContainmentIndex(docs: DataFrame, freq: DataFrame,
                                    n: Int, blockCols: Seq[String])

  /** Build the reusable data-side index for [[containmentRSIndexed]]. */
  def buildContainmentIndex(data: DataFrame, idCol: String, textCol: String,
                            blockCols: Seq[String], n: Int = 3): ContainmentIndex = {
    val nPart = data.sparkSession.sessionState.conf.numShufflePartitions
    // spread BEFORE exploding: the repartition then moves one array row per
    // document instead of hundreds of exploded shingle rows (a 400 MB
    // shuffle at sf0.1 became a 5k-row one), and this single exchange is
    // the ReuseExchange point for the df aggregation, candidate probe, and
    // verification join below
    val dSh = shingled(data, textCol, n)
      .select(col(idCol).as("d_id") +: col("shingles").as("d_shingles") +:
        blockCols.map(c => col(c).as(s"d_$c")): _*)
      .repartition(nPart, col("d_id"))
    val freq = dSh.select(explode(col("d_shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    ContainmentIndex(dSh, freq, n, blockCols)
  }

  def containmentRS(queries: DataFrame, data: DataFrame, idCol: String,
                    textCol: String, blockCols: Seq[String], tau: Double,
                    n: Int = 3,
                    queriesBroadcast: Option[Boolean] = None,
                    excludeSelf: Boolean = true): DataFrame =
    containmentRSIndexed(queries,
      buildContainmentIndex(data, idCol, textCol, blockCols, n),
      idCol, textCol, tau, queriesBroadcast, excludeSelf)

  /** [[containmentRS]] against a prebuilt (usually persisted) data-side
    * index — the repeated-decontamination entry point: N eval sets scan the
    * corpus once, not N times.
    */
  def containmentRSIndexed(queries: DataFrame, index: ContainmentIndex,
                           idCol: String, textCol: String, tau: Double,
                           queriesBroadcast: Option[Boolean] = None,
                           excludeSelf: Boolean = true): DataFrame = {
    val n = index.n
    val blockCols = index.blockCols
    val qSmall = queriesBroadcast.getOrElse(
      queries.limit((MaxBroadcastQueries + 1).toInt).count() <= MaxBroadcastQueries)
    def maybeBroadcast(df: DataFrame): DataFrame = if (qSmall) broadcast(df) else df
    val qSh = shingled(queries, textCol, n).filter(col("sh_sz") > 0)
      .select(col(idCol).as("q_id") +: col("sh_sz").as("q_sz") +:
        col("shingles").as("q_shingles") +:
        blockCols.map(c => col(c).as(s"q_$c")): _*)
    val dSh = index.docs
    val freq = index.freq

    // rank each query's shingles rarest-first by DATA-side df (query-only
    // shingles default df 0 — they prune hardest). The exploded query side
    // is the small side BY CONTRACT (an eval set), so the full df relation
    // never shuffles: first an inner join restricts freq to the query
    // shingles (broadcast the query-shingle set, stream freq), then the
    // outer df-attach joins that RESTRICTED — hence small — relation back
    // broadcast-side. Two broadcast joins, deliberately: a single outer
    // join can't broadcast the small side here (BroadcastHashJoin only
    // builds the non-preserved side, so a right-outer with the query side
    // preserved would silently shuffle both inputs).
    val qExploded = qSh
      .select(col("q_id") +: col("q_sz") +: blockCols.map(c => col(s"q_$c")) :+
        explode(col("q_shingles")).as("sh"): _*)
    val qFreq = freq.join(maybeBroadcast(qExploded.select("sh").distinct()), Seq("sh"))
    val qPref = qExploded.join(maybeBroadcast(qFreq), Seq("sh"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy(col("q_id") +: col("q_sz") +: blockCols.map(c => col(s"q_$c")): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("rs"))
      .withColumn("prefix", slice(col("rs.sh"), lit(1),
        (col("q_sz") - ceil(col("q_sz") * lit(tau) - lit(1e-9)) + lit(1)).cast("int")))
      .select(col("q_id") +: blockCols.map(c => col(s"q_$c")) :+
        explode(col("prefix")).as("q_sh"): _*)

    val dInv = dSh.select(col("d_id") +: blockCols.map(c => col(s"d_$c")) :+
      explode(col("d_shingles")).as("d_sh"): _*)
    val blockEq = blockCols.map(c => col(s"q_$c") === col(s"d_$c"))
    val selfEx = if (excludeSelf) Seq(col("q_id") =!= col("d_id")) else Nil
    val cond = (((col("q_sh") === col("d_sh")) +: blockEq) ++ selfEx).reduce(_ && _)

    // candidates (broadcast prefix probe — no shuffle of the exploded data
    // side) → exact verification on the carried arrays (block match
    // already enforced in candidate generation)
    dInv.join(maybeBroadcast(qPref), cond)
      .select("q_id", "d_id").distinct()
      .join(dSh.select("d_id", "d_shingles"), "d_id")
      .join(maybeBroadcast(qSh.select("q_id", "q_sz", "q_shingles")), "q_id")
      .withColumn("inter", size(array_intersect(col("q_shingles"), col("d_shingles"))))
      .withColumn("contain", col("inter").cast("double") / col("q_sz").cast("double"))
      .filter(col("contain") >= tau)
      .select(col("q_id"), col("d_id"), Det.round6(col("contain")).as("contain"))
      .orderBy("q_id", "d_id")
  }

  /** Global token → document-frequency relation. Vernica stage 1.
    * Bounded by vocabulary size → broadcastable.
    */
  def tokenFrequency(docs: DataFrame, textCol: String): DataFrame =
    tokenized(docs, textCol)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))

  /** Token-frequency relation with a dense global rank by (df, token) —
    * WITHOUT a global single-partition window. Rank = per-df row_number
    * (distributed: partitioned by df) + a cumulative offset computed on the
    * df-histogram, which has one row per distinct df value — a relation
    * orders of magnitude smaller than the vocabulary, so its tiny window
    * is not a scale bottleneck, and it is broadcast back.
    */
  def tokenFrequencyRanked(docs: DataFrame, textCol: String): DataFrame = {
    val freq = tokenFrequency(docs, textCol)
    val hist = freq.groupBy("df").agg(count(lit(1)).as("cnt"))
    val offs = hist
      .withColumn("off", coalesce(
        sum(col("cnt")).over(
          Window.orderBy("df").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("df", "off")
    freq.join(broadcast(offs), "df")
      .withColumn("rnk",
        (col("off") + row_number().over(Window.partitionBy("df").orderBy("token"))).cast("long"))
      .select("token", "df", "rnk")
  }

  /** Prefix-filtered exact Jaccard self-join — the 100 TB plan.
    *
    * Tokens are sorted rarest-first by (global document frequency, token);
    * only the first |x| − ⌈τ·|x|⌉ + 1 tokens of each record are indexed
    * [PPJoin]. Any pair with J ≥ τ must share ≥1 prefix token, so candidate
    * generation over the prefix index is complete — and the highest-
    * frequency (skew-driving) tokens are exactly the ones never indexed.
    * Verification re-checks the full token sets via array_intersect on the
    * carried arrays. Equivalence with [[jaccardSelf]] is property-tested.
    *
    * The frequency order is applied by sorting (df, token) structs per
    * record — no materialized global rank, no global window.
    */
  def jaccardSelfPrefix(docs: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], tau: Double): DataFrame =
    jaccardSelfPrefixOnSets(tokenized(docs, textCol), idCol, "tokens", blockCols, tau)

  /** Probe-dispatched exact Jaccard R-S join — [[jaccardSelfAuto]]'s R-S
    * sibling: [[vocabSkew]] on the DATA side (the side whose token skew
    * drives the candidate join) picks [[jaccardRS]] or [[jaccardRSPrefix]],
    * both exact.
    */
  def jaccardRSAuto(queries: DataFrame, data: DataFrame, idCol: String,
                    textCol: String, blockCols: Seq[String], tau: Double,
                    usePrefix: Option[Boolean] = None,
                    saltCandidates: Option[Boolean] = None): DataFrame = {
    lazy val skew = vocabSkew(tokenized(data, textCol), "tokens")
    val prefix = usePrefix.getOrElse(skew >= PrefixSkewThreshold)
    val salted = prefix && saltCandidates.getOrElse(skew >= SaltSkewThreshold)
    if (prefix) jaccardRSPrefix(queries, data, idCol, textCol, blockCols, tau,
      nSalts = if (salted) CandidateSalts else 1)
    else jaccardRS(queries, data, idCol, textCol, blockCols, tau)
  }

  /** Prefix-filtered exact Jaccard R-S join — the 100 TB plan for the
    * query-vs-corpus case ([[jaccardRS]]'s scale sibling, same contract).
    *
    * Correctness needs both sides to rank tokens under ONE total order; the
    * document frequency is computed on the DATA side (the side whose skew
    * matters) and query-only tokens default to df 0 — the order stays total
    * via the (df, token) tiebreak, and a shared prefix token of a true pair
    * is by definition present in both records, so both sides rank it
    * identically. Prefix lengths use the same |x| − ⌈τ·|x|⌉ + 1 bound as
    * the self-join; verification re-intersects the full token arrays.
    * Equivalence with [[jaccardRS]] is property-tested.
    */
  def jaccardRSPrefix(queries: DataFrame, data: DataFrame, idCol: String,
                      textCol: String, blockCols: Seq[String], tau: Double,
                      vocabBroadcast: Option[Boolean] = None,
                      nSalts: Int = 1): DataFrame = {
    val freq = tokenized(data, textCol)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))

    def ranked(df: DataFrame, p: String) = {
      val toks = tokenized(df, textCol)
        .select(col(idCol).as(s"${p}_id") +: col("sz").as(s"${p}_sz") +:
          col("tokens") +: blockCols.map(col): _*)
      val joined = freqJoined(
        toks.select(col(s"${p}_id") +: col(s"${p}_sz") +: blockCols.map(col) :+
          explode(col("tokens")).as("token"): _*),
        freq, "token", vocabBroadcast, joinType = "left")
        .withColumn("df", coalesce(col("df"), lit(0L)))
      joined
        .groupBy(col(s"${p}_id") +: col(s"${p}_sz") +: blockCols.map(col): _*)
        .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("rt"))
        .withColumn(s"${p}_toks", col("rt.token"))
        .withColumn("prefix", slice(col(s"${p}_toks"), lit(1),
          (col(s"${p}_sz") - ceil(col(s"${p}_sz") * lit(tau) - lit(1e-9)) + lit(1)).cast("int")))
        .select(col(s"${p}_id") +: col(s"${p}_sz") +: col(s"${p}_toks") +:
          explode(col("prefix")).as(s"${p}_tok") +:
          blockCols.map(c => col(c).as(s"${p}_$c")): _*)
    }

    val candidates = if (nSalts <= 1) {
      val q = ranked(queries, "q")
      val n = data.sparkSession.sessionState.conf.numShufflePartitions
      val d = ranked(data, "d")
        .repartition(n, col("d_tok") +: blockCols.map(c => col(s"d_$c")): _*)
      val blockEq = blockCols.map(c => col(s"q_$c") === col(s"d_$c"))
      val cond = ((col("q_tok") === col("d_tok")) +: blockEq).reduce(_ && _) &&
        col("q_id") =!= col("d_id") &&
        lenOk(col("q_sz"), col("d_sz"), tau)
      d.join(q, cond)
        .select("q_id", "d_id", "q_sz", "d_sz", "q_toks", "d_toks")
    } else {
      // extreme-skew path: shared key names turn the candidate join into a
      // pure usingColumns equi-join so [[Salting.saltedEquiJoin]] can spread
      // each hot (token, block) key over nSalts reducers — the data side is
      // the salted probe (its skew is what's being treated), the query-side
      // prefix index is the replicated build (small by the R-S contract).
      // No explicit pre-repartition: the salted join's own shuffle on
      // (keys…, salt) IS the spread.
      def shared(df: DataFrame, p: String) = {
        val renamed = blockCols.foldLeft(ranked(df, p).withColumnRenamed(s"${p}_tok", "tok")) {
          case (acc, c) => acc.withColumnRenamed(s"${p}_$c", c)
        }
        renamed
      }
      Salting.saltedEquiJoin(shared(data, "d"), shared(queries, "q"),
          "tok" +: blockCols, saltBy = Seq("d_id"), nSalts)
        .filter(col("q_id") =!= col("d_id") && lenOk(col("q_sz"), col("d_sz"), tau))
        .select("q_id", "d_id", "q_sz", "d_sz", "q_toks", "d_toks")
    }

    candidates
      .dropDuplicates("q_id", "d_id")
      .withColumn("inter", size(array_intersect(col("q_toks"), col("d_toks"))))
      .withColumn("sim",
        col("inter").cast("double") / (col("q_sz") + col("d_sz") - col("inter")).cast("double"))
      .filter(col("sim") >= tau)
      .select(col("q_id"), col("d_id"), Det.round6(col("sim")).as("sim"))
      .orderBy("q_id", "d_id")
  }

  /** Prefix-filtered exact set-Jaccard self-join over an arbitrary
    * precomputed set column — the generic core behind [[jaccardSelfPrefix]]
    * (word tokens) and the prefix-pruned n-gram join. The element-frequency
    * relation is computed from the sets themselves.
    */
  def jaccardSelfPrefixOnSets(sets: DataFrame, idCol: String, setCol: String,
                              blockCols: Seq[String], tau: Double,
                              vocabBroadcast: Option[Boolean] = None,
                              nSalts: Int = 1,
                              sorted: Boolean = true): DataFrame = {
    val withSz = sets.withColumn("_sz", size(col(setCol)))
    val toks = withSz
      .select(col(idCol).as("id") +: col("_sz").as("sz") +:
        col(setCol).as("tokens") +: blockCols.map(col): _*)

    val freq = sets
      .select(explode(col(setCol)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))

    // order each record's tokens rarest-first by (df, token); the frequency
    // relation broadcasts only while the vocabulary is provably bounded —
    // open-vocabulary corpora take the shuffle equi-join (see [[freqJoined]])
    val ranked = freqJoined(
      toks.select(col("id") +: col("sz") +: blockCols.map(col) :+
        explode(col("tokens")).as("token"): _*),
      freq, "token", vocabBroadcast)
      .groupBy(col("id") +: col("sz") +: blockCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("token")))).as("rt"))
      .withColumn("sorted_tokens", col("rt.token"))
      // FP-robust ⌈sz·τ⌉: epsilon-down so an integral sz·τ never rounds up,
      // which would shorten the prefix and silently drop true pairs.
      .withColumn("prefix", slice(col("sorted_tokens"), lit(1),
        (col("sz") - ceil(col("sz") * lit(tau) - lit(1e-9)) + lit(1)).cast("int")))
      .drop("rt")

    val candidates = if (nSalts <= 1) {
      val a = ranked.select(col("id").as("a_id") +: col("sz").as("a_sz") +:
        col("sorted_tokens").as("a_toks") +: explode(col("prefix")).as("tok") +:
        blockCols.map(c => col(c).as(s"a_$c")): _*)
      val b = ranked.select(col("id").as("b_id") +: col("sz").as("b_sz") +:
        col("sorted_tokens").as("b_toks") +: explode(col("prefix")).as("b_tok") +:
        blockCols.map(c => col(c).as(s"b_$c")): _*)
      val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
      val cond = ((col("tok") === col("b_tok")) +: blockEq).reduce(_ && _) &&
        col("a_id") < col("b_id") &&
        lenOk(col("a_sz"), col("b_sz"), tau)
      a.join(b, cond)
        .select("a_id", "b_id", "a_sz", "b_sz", "a_toks", "b_toks")
    } else {
      // extreme-skew path (see [[SaltSkewThreshold]]): shared key names make
      // the candidate join a pure usingColumns equi-join for
      // [[Salting.saltedEquiJoin]] — each hot (token, block) key spreads
      // over nSalts reducers; the a-side is the salted probe, the b-side
      // index replicates nSalts×. The a<b / length filters move to a
      // post-join residual, which Catalyst pushes back into the join.
      val a = ranked.select(col("id").as("a_id") +: col("sz").as("a_sz") +:
        col("sorted_tokens").as("a_toks") +: explode(col("prefix")).as("tok") +:
        blockCols.map(col): _*)
      val b = ranked.select(col("id").as("b_id") +: col("sz").as("b_sz") +:
        col("sorted_tokens").as("b_toks") +: explode(col("prefix")).as("tok") +:
        blockCols.map(col): _*)
      Salting.saltedEquiJoin(a, b, "tok" +: blockCols, saltBy = Seq("a_id"), nSalts)
        .filter(col("a_id") < col("b_id") && lenOk(col("a_sz"), col("b_sz"), tau))
        .select("a_id", "b_id", "a_sz", "b_sz", "a_toks", "b_toks")
    }

    candidates
      .dropDuplicates("a_id", "b_id")
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))))
      .withColumn("sim",
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
      .filter(col("sim") >= tau)
      .select(col("a_id"), col("b_id"), Det.round6(col("sim")).as("sim"))
      .maybeOrdered(sorted, "a_id", "b_id")
  }
}
