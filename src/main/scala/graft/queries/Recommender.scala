package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.expr.GraftFunctions
import graft.rec.{AlsPipeline, Ratings}

/** Recommender-core catalog (SURVEY §2.10, §3.1–3.3) over the synthesized
  * ratings view (user = customer, item = part, rating ∈ {1..5}).
  *
  * q32 item-CF is the batch form of the reference's real-time item-based
  * recommender (`/root/reference/src/streaming/streaming_rec.py:106-114`):
  * item-item cosine over the user-item matrix, computed as a per-user
  * self-join — the shuffle key is user_id, so the quadratic term is
  * bounded by per-user degree, never by catalog size; this is the shape
  * that survives 100 TB. Power users are degree-capped ([[Ratings.capped]],
  * cap=64 ≈ p95 of the fixture's degree distribution): each user
  * contributes at most cap² pairs, so one user who rated 100k items costs
  * 64²=4096 pairs, not 10¹⁰ — the oracle SQL applies the identical
  * deterministic cap, and ItemCfSpec proves cap-equality on uniform data.
  */
object Recommender {

  private def rview = Ratings.viewSql

  /** Per-user degree cap for the item-CF self-join (see object doc). */
  private[queries] val DegreeCap = 64

  /** Item-item cosine similarity top-50 (co-rated by ≥3 users), over the
    * degree-capped ratings view. Norms are computed over the same capped
    * view so cos stays a true cosine of the capped vectors. */
  val itemCf = Q(
    "q32_item_cf",
    (s, d) => {
      val r = Ratings.capped(Ratings.view(s, d), DegreeCap).cache()
      val norms = r.groupBy(col("item_id"))
        .agg(sqrt(sum(col("rating") * col("rating"))).as("nrm"))
      val co = r.select(col("user_id"), col("item_id").as("i"), col("rating").as("ri"))
        .join(r.select(col("user_id"), col("item_id").as("j"), col("rating").as("rj")),
          Seq("user_id"))
        .where(col("i") < col("j"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("ri") * col("rj")).as("dot"), count(lit(1)).as("n_common"))
        .where(col("n_common") >= 3)
      co.join(broadcast(norms.select(col("item_id").as("i"), col("nrm").as("ni"))), Seq("i"))
        .join(broadcast(norms.select(col("item_id").as("j"), col("nrm").as("nj"))), Seq("j"))
        .select(col("i"), col("j"), col("n_common"),
          round(col("dot") / (col("ni") * col("nj")), 6).as("cos"))
        .orderBy(col("cos").desc, col("i"), col("j"))
        .limit(50)
    },
    Some(s"""WITH r AS (${Ratings.cappedSql(DegreeCap)}),
            n AS (SELECT item_id, sqrt(sum(rating*rating)) AS nrm FROM r GROUP BY 1),
            co AS (SELECT a.item_id AS i, b.item_id AS j,
                     sum(a.rating*b.rating) AS dot, count(*) AS n_common
                   FROM r a JOIN r b ON a.user_id = b.user_id AND a.item_id < b.item_id
                   GROUP BY 1, 2 HAVING count(*) >= 3)
            SELECT i, j, n_common, round(dot / (ni.nrm * nj.nrm), 6) AS cos
            FROM co JOIN n ni ON ni.item_id = i JOIN n nj ON nj.item_id = j
            ORDER BY cos DESC, i, j LIMIT 50""")
  )

  /** A5 RMSE of the item-mean baseline predictor, via the typed RMSE
    * Aggregator (graft.expr.RmseAggregator) — oracle is the SQL
    * closed form. */
  val rmseBaseline = Q(
    "q33_rmse_baseline",
    (s, d) => {
      GraftFunctions.register(s)
      val r = Ratings.view(s, d)
      val itemAvg = r.groupBy(col("item_id")).agg(avg(col("rating")).as("pred"))
      // item-dimension-sized predictor table: broadcast so the ratings
      // fact is not shuffled for the join
      r.join(broadcast(itemAvg), Seq("item_id"))
        .agg(round(call_function("rmse_agg", col("pred"), col("rating")), 6)
          .as("rmse"))
    },
    Some(s"""WITH r AS ($rview),
            ia AS (SELECT item_id, avg(rating) AS pred FROM r GROUP BY 1)
            SELECT round(sqrt(avg(pow(r.rating - ia.pred, 2))), 6) AS rmse
            FROM r JOIN ia ON r.item_id = ia.item_id""")
  )

  /** T6 per-user top-3 items by rating (windowed top-k on the ratings
    * view — the serve-path ranking shape). */
  val userTopk = Q(
    "q34_user_topk",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("rating").desc, col("item_id"))
      Ratings.view(s, d)
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("user_id"), col("item_id"), round(col("rating"), 6).as("rating"),
                col("rank"))
        .orderBy(col("user_id"), col("rank"))
    },
    Some(s"""SELECT user_id, item_id, round(rating, 6) AS rating, rank FROM (
              SELECT user_id, item_id, rating,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY rating DESC, item_id) AS rank
              FROM ($rview) r) t
            WHERE rank <= 3 ORDER BY user_id, rank""")
  )

  /** A7 Precision@5 / Recall@5 of a popularity recommender against a
    * deterministic holdout ((user+item) % 4 = 0), averaged over users
    * with ≥1 holdout item (ref metric `src/csv/train_topn.py:112-145`). */
  val precisionRecall = Q(
    "q35_precision_recall",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val test = r.where((col("user_id") + col("item_id")) % 4 === 0)
      val train = r.where((col("user_id") + col("item_id")) % 4 =!= 0)
      val top5 = train.groupBy(col("item_id")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("item_id")).limit(5)
        .select(col("item_id"))
      val perUser = test.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_test"))
      val hits = test.join(broadcast(top5), Seq("item_id"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("h"))
      perUser.join(hits, Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("h"), lit(0L)).as("h"), col("n_test"))
        .agg(round(avg(col("h") / 5.0), 6).as("p_at_5"),
             round(avg(col("h").cast("double") / col("n_test")), 6).as("r_at_5"))
    },
    Some(s"""WITH r AS ($rview),
            test AS (SELECT * FROM r WHERE (user_id + item_id) % 4 = 0),
            train AS (SELECT * FROM r WHERE (user_id + item_id) % 4 <> 0),
            top5 AS (SELECT item_id FROM (
              SELECT item_id, count(*) AS c FROM train GROUP BY 1
              ORDER BY c DESC, item_id LIMIT 5)),
            pu AS (SELECT user_id, count(*) AS n_test FROM test GROUP BY 1),
            hits AS (SELECT t.user_id, count(*) AS h
                     FROM test t JOIN top5 USING (item_id) GROUP BY 1)
            SELECT round(avg(coalesce(h, 0) / 5.0), 6) AS p_at_5,
                   round(avg(CAST(coalesce(h, 0) AS DOUBLE) / n_test), 6) AS r_at_5
            FROM pu LEFT JOIN hits USING (user_id)""")
  )

  /** M4 capability — LightGCN-style 1-layer graph propagation (He et al.
    * 2020, SIGIR; ref `/root/reference/src/csv/train_rmse.py:121`) of a
    * deterministic item embedding (avg rating, degree) through the
    * user-item bipartite graph with 1/sqrt(d_u·d_i) normalization,
    * expressed purely as joins + aggregations — semantics, not gradient
    * descent (SURVEY §7.4). */
  val graphPropagation = Q(
    "q36_graph_propagation",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val du = r.groupBy(col("user_id")).agg(count(lit(1)).as("du"))
      val di = r.groupBy(col("item_id")).agg(count(lit(1)).as("di"))
      val e0 = r.groupBy(col("item_id")).agg(
        avg(col("rating")).as("f1"), count(lit(1)).cast("double").as("f2"))
      val edges = r.join(broadcast(du), Seq("user_id"))
        .join(broadcast(di), Seq("item_id"))
        .select(col("user_id"), col("item_id"),
          (lit(1.0) / sqrt(col("du") * col("di"))).as("w"))
        // few fat partitions for the two broadcast-join propagation
        // aggregations (no exchange left for AQE to coalesce)
        .coalesce(math.max(2, s.sparkContext.defaultParallelism / 4))
        .cache()
      // e0/eu broadcast: item-/user-dimension-sized embedding tables —
      // the edge fact stays unshuffled through both propagation joins
      val eu = edges.join(broadcast(e0), Seq("item_id"))
        .groupBy(col("user_id"))
        .agg(sum(col("f1") * col("w")).as("f1"), sum(col("f2") * col("w")).as("f2"))
      val e1 = edges.join(broadcast(eu), Seq("user_id"))
        .groupBy(col("item_id"))
        .agg(round(sum(col("f1") * col("w")), 6).as("f1"),
             round(sum(col("f2") * col("w")), 6).as("f2"))
      e1.orderBy(col("item_id"))
    },
    Some(s"""WITH r AS ($rview),
            du AS (SELECT user_id, count(*) AS du FROM r GROUP BY 1),
            di AS (SELECT item_id, count(*) AS di FROM r GROUP BY 1),
            e0 AS (SELECT item_id, avg(rating) AS f1,
                     CAST(count(*) AS DOUBLE) AS f2 FROM r GROUP BY 1),
            ed AS (SELECT r.user_id, r.item_id, 1.0 / sqrt(du.du * di.di) AS w
                   FROM r JOIN du USING (user_id) JOIN di USING (item_id)),
            eu AS (SELECT ed.user_id, sum(e0.f1 * ed.w) AS f1,
                     sum(e0.f2 * ed.w) AS f2
                   FROM ed JOIN e0 USING (item_id) GROUP BY 1)
            SELECT ed.item_id, round(sum(eu.f1 * ed.w), 6) AS f1,
                   round(sum(eu.f2 * ed.w), 6) AS f2
            FROM ed JOIN eu USING (user_id)
            GROUP BY 1 ORDER BY item_id""")
  )

  /** M4 at the reference's depth — K=2 LightGCN propagation (the ref
    * trains 2 layers, `/root/reference/src/csv/train_rmse.py:44-48`) via
    * [[graft.rec.GraphPropagation.propagate]], oracle-checked: the same
    * deterministic 2-dim item embedding as q36 pushed through TWO
    * normalized item→user→item rounds, output layer-averaged over
    * (e0, e1, e2) as LightGCN does. Exercises the K-layer API end to end
    * (q36 covers only the 1-layer face). */
  val graphPropagationK2 = Q(
    "q65_graph_prop_k2",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val e0 = r.groupBy(col("item_id")).agg(
        avg(col("rating")).as("f1"), count(lit(1)).cast("double").as("f2"))
      val exploded = e0.select(col("item_id"),
        posexplode(array(col("f1"), col("f2"))).as(Seq("pos", "v")))
      graft.rec.GraphPropagation.propagate(r, exploded, layers = 2)
        .groupBy(col("item_id"))
        .agg(round(sum(when(col("pos") === 0, col("v"))), 6).as("f1"),
             round(sum(when(col("pos") === 1, col("v"))), 6).as("f2"))
        .orderBy(col("item_id"))
    },
    Some(s"""WITH r AS ($rview),
            du AS (SELECT user_id, count(*) AS du FROM r GROUP BY 1),
            di AS (SELECT item_id, count(*) AS di FROM r GROUP BY 1),
            ed AS (SELECT r.user_id, r.item_id, 1.0 / sqrt(du.du * di.di) AS w
                   FROM r JOIN du USING (user_id) JOIN di USING (item_id)),
            e0 AS (SELECT item_id, avg(rating) AS f1,
                     CAST(count(*) AS DOUBLE) AS f2 FROM r GROUP BY 1),
            u1 AS (SELECT ed.user_id, sum(e0.f1 * ed.w) AS f1,
                     sum(e0.f2 * ed.w) AS f2
                   FROM ed JOIN e0 USING (item_id) GROUP BY 1),
            e1 AS (SELECT ed.item_id, sum(u1.f1 * ed.w) AS f1,
                     sum(u1.f2 * ed.w) AS f2
                   FROM ed JOIN u1 USING (user_id) GROUP BY 1),
            u2 AS (SELECT ed.user_id, sum(e1.f1 * ed.w) AS f1,
                     sum(e1.f2 * ed.w) AS f2
                   FROM ed JOIN e1 USING (item_id) GROUP BY 1),
            e2 AS (SELECT ed.item_id, sum(u2.f1 * ed.w) AS f1,
                     sum(u2.f2 * ed.w) AS f2
                   FROM ed JOIN u2 USING (user_id) GROUP BY 1)
            SELECT e0.item_id,
                   round((e0.f1 + e1.f1 + e2.f1) / 3, 6) AS f1,
                   round((e0.f2 + e1.f2 + e2.f2) / 3, 6) AS f2
            FROM e0 JOIN e1 USING (item_id) JOIN e2 USING (item_id)
            ORDER BY item_id""")
  )

  /** A6 multiclass accuracy (ref `test/horovod_test.py:155-157`: argmax
    * over a per-class score vector → MulticlassClassificationEvaluator
    * accuracy). The deterministic stand-in for the NN's prob vector is the
    * per-item class-count vector (counts of each rating 1..5); prediction
    * = argmax (first max wins — array_position ∘ array_max, the F11
    * composition), accuracy = share of ratings the majority class gets.
    * MiscRecSpec asserts this equals MLlib's evaluator on the same
    * predictions; counts are exact integers so the oracle ratio is
    * bit-stable. */
  val multiclassAccuracy = Q(
    "q71_multiclass_accuracy",
    (s, d) => {
      val r = Ratings.view(s, d)
      val countCols = (1 to 5).map(c =>
        sum(when(col("rating") === c, 1L).otherwise(0L)).as(s"c$c"))
      val scores = array((1 to 5).map(c => col(s"c$c")): _*)
      val pred = r.groupBy(col("item_id"))
        .agg(countCols.head, countCols.tail: _*)
        .select(col("item_id"),
          array_position(scores, array_max(scores)).cast("long").as("pred_class"))
      // item-dimension-sized prediction table: broadcast (as q33)
      r.join(broadcast(pred), Seq("item_id"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("rating") === col("pred_class"), 1L).otherwise(0L))
               .as("n_correct"))
        .select(col("n"), col("n_correct"),
          round(col("n_correct").cast("double") / col("n"), 6).as("accuracy"))
    },
    Some(s"""WITH r AS ($rview),
            cc AS (SELECT item_id,
                     ${(1 to 5).map(c =>
                       s"CAST(sum(CASE WHEN rating = $c THEN 1 ELSE 0 END) AS BIGINT) AS c$c")
                       .mkString(", ")}
                   FROM r GROUP BY 1),
            p AS (SELECT item_id,
                    CASE ${(1 to 5).map(c => s"WHEN c$c = g THEN $c").mkString(" ")}
                    END AS pred_class
                  FROM (SELECT *, greatest(c1, c2, c3, c4, c5) AS g FROM cc)),
            acc AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN rating = pred_class THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct
                    FROM r JOIN p USING (item_id))
            SELECT n, n_correct,
              round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy FROM acc""")
  )

  /** M1–M3 ALS end-to-end: train on the ratings view (seeded), recommend
    * top-5 unseen items for users 0..19. Not SQL-expressible → rows-only
    * driver check; quality is asserted in AlsSpec (RMSE band). */
  val alsRecs = Q(
    "q37_als_recs",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val model = AlsPipeline.fit(r)
      val users = r.select(col("user_id")).where(col("user_id") < 20).distinct()
      AlsPipeline.recommendTopK(model, r, users, 5)
        .orderBy(col("user_id"), col("rank"))
    },
    None
  )

  /** q37's deterministic oracle face (VERDICT r10 item 5 — the one
    * catalog row without a hash gate): the EXACT serving path q37 runs —
    * candidate generation × item catalog, anti-join against rated
    * pairs, [[AlsPipeline.scoreFactors]] factor join, per-user window
    * top-k — but over FIXED factor tables whose entries are a closed
    * form of the ids (`((id·7 + j·3) mod 16)/16` per user dim j,
    * `((id·5 + j·2) mod 16)/16` per item dim j, rank 4). Factors are
    * then just data: DuckDB reproduces every score exactly (sixteenths
    * are exact binary fractions, and a 4-term left-to-right dot product
    * is bit-identical cross-engine), so the serving plan itself gets a
    * full rows+schema+hash gate. q37 keeps serving TRAINED factors
    * rows-only — ALS factor output is nondeterministic, and its quality
    * is anchored by AlsSpec's published-table parity instead. */
  val alsServeFixed = Q(
    "q125_als_serve_fixed",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val uf = r.select(col("user_id")).distinct()
        .withColumn("uf", transform(sequence(lit(0L), lit(3L)),
          j => ((col("user_id") * 7 + j * 3) % 16).cast("double") / 16.0))
      val itf = r.select(col("item_id")).distinct()
        .withColumn("if", transform(sequence(lit(0L), lit(3L)),
          j => ((col("item_id") * 5 + j * 2) % 16).cast("double") / 16.0))
      val users = r.select(col("user_id")).where(col("user_id") < 20).distinct()
      AlsPipeline.serveTopK(uf, itf, r, users, 5)
        .orderBy(col("user_id"), col("rank"))
    },
    Some(s"""WITH r AS ($rview),
            users AS (SELECT DISTINCT user_id FROM r WHERE user_id < 20),
            items AS (SELECT DISTINCT item_id FROM r),
            cand AS (SELECT user_id, item_id FROM users CROSS JOIN items
                     ANTI JOIN r USING (user_id, item_id)),
            scored AS (SELECT user_id, item_id,
              CAST((user_id * 7 + 0) % 16 AS DOUBLE) / 16 * (CAST((item_id * 5 + 0) % 16 AS DOUBLE) / 16)
              + CAST((user_id * 7 + 3) % 16 AS DOUBLE) / 16 * (CAST((item_id * 5 + 2) % 16 AS DOUBLE) / 16)
              + CAST((user_id * 7 + 6) % 16 AS DOUBLE) / 16 * (CAST((item_id * 5 + 4) % 16 AS DOUBLE) / 16)
              + CAST((user_id * 7 + 9) % 16 AS DOUBLE) / 16 * (CAST((item_id * 5 + 6) % 16 AS DOUBLE) / 16)
                AS score
              FROM cand),
            ranked AS (SELECT user_id, item_id,
                         CAST(row_number() OVER (PARTITION BY user_id
                           ORDER BY score DESC, item_id) AS BIGINT) AS rank,
                         score
                       FROM scored)
            SELECT user_id, item_id, rank, round(score, 6) AS score
            FROM ranked WHERE rank <= 5 ORDER BY user_id, rank""")
  )

  /** A8 — weighted loss averaging (ref `src/csv/train_topn.py:80-109`
    * accumulates per-batch losses and divides by the batch count): the
    * epoch-level training metric `Σ(loss_b·n_b) / Σ(n_b)` over a
    * deterministic per-batch loss table — batches are `user_id % 20`
    * slices of the ratings view, the loss is each batch's MSE against
    * the global-mean predictor. The macro (unweighted) mean is reported
    * alongside: the two differ exactly when batch sizes are uneven,
    * which is what the weighting is for. One shuffle on the batch key,
    * then a single-row final aggregate. */
  val weightedLoss = Q(
    "q81_weighted_loss",
    (s, d) => {
      val r = Ratings.view(s, d)
      val g = r.agg(avg(col("rating")).as("mu"))
      val batches = r.withColumn("batch", col("user_id") % 20)
        .crossJoin(broadcast(g))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n"),
             avg(pow(col("rating") - col("mu"), 2)).as("loss"))
      batches.agg(
        count(lit(1)).as("n_batches"),
        sum(col("n")).as("total_n"),
        round(sum(col("loss") * col("n")) / sum(col("n")), 6).as("weighted_loss"),
        round(avg(col("loss")), 6).as("macro_loss"))
    },
    Some(s"""WITH r AS ($rview),
            g AS (SELECT avg(rating) AS mu FROM r),
            b AS (SELECT user_id % 20 AS batch, count(*) AS n,
                    avg(pow(rating - mu, 2)) AS loss
                  FROM r CROSS JOIN g GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_batches,
                   CAST(sum(n) AS BIGINT) AS total_n,
                   round(sum(loss * n) / sum(n), 6) AS weighted_loss,
                   round(avg(loss), 6) AS macro_loss
            FROM b""")
  )

  /** F12 — BPR loss evaluation (Rendle et al. 2009; ref
    * `doc/课程报告.md:921-923`, `src/csv/train_topn.py:98-102` trains on
    * `-ln σ(s_pos − s_neg)`): the loss of the ITEM-MEAN scorer (q33's
    * predictor) over deterministic (user, pos, neg) triples — each
    * user's top-rated item (rating desc, item_id tiebreak) against
    * their bottom-rated one (rating asc, item_id desc), kept only where
    * the ratings strictly differ. `-ln σ(d) = ln(1+exp(−d))` is a pure
    * scalar expression; each triple's loss is rounded to 6dp before
    * averaging so a ≤1-ulp libm divergence between engines cannot
    * surface, and pairwise accuracy (share of triples the scorer
    * orders correctly) rides along as an exact integer count. */
  val bprLoss = Q(
    "q82_bpr_loss",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val im = r.groupBy(col("item_id")).agg(avg(col("rating")).as("im"))
      // Head-tail extremes in ONE partially-aggregated groupBy instead
      // of two window passes (each an exchange + full sort of the
      // ratings fact) + a pos⋈neg self-join: (rating desc, item_id asc)
      // top-1 == argmax of (rating, -item_id), (rating asc, item_id
      // desc) top-1 == argmin of the same key, and the key is unique
      // per user row so max_by/min_by are deterministic. Comparisons
      // only — the selected rows are bit-identical to the window
      // form's. The item-mean joins broadcast (item-dimension-sized).
      val t = r.groupBy(col("user_id")).agg(
          max_by(struct(col("item_id"), col("rating")),
            struct(col("rating"), -col("item_id"))).as("p"),
          min_by(struct(col("item_id"), col("rating")),
            struct(col("rating"), -col("item_id"))).as("n"))
        .where(col("p.rating") > col("n.rating"))
        .select(col("user_id"), col("p.item_id").as("pos_item"),
          col("n.item_id").as("neg_item"))
        .join(broadcast(im.select(col("item_id").as("pos_item"),
          col("im").as("s_pos"))), Seq("pos_item"))
        .join(broadcast(im.select(col("item_id").as("neg_item"),
          col("im").as("s_neg"))), Seq("neg_item"))
        .withColumn("dd", col("s_pos") - col("s_neg"))
        .withColumn("loss", round(log(lit(1.0) + exp(-col("dd"))), 6))
      t.agg(count(lit(1)).as("n_triples"),
        sum(when(round(col("dd"), 6) > 0, 1L).otherwise(0L)).as("n_correct"),
        round(avg(col("loss")), 6).as("bpr_loss"))
    },
    Some(s"""WITH r AS ($rview),
            im AS (SELECT item_id, avg(rating) AS im FROM r GROUP BY 1),
            pos AS (SELECT user_id, item_id AS pos_item, rating AS pos_r FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY rating DESC, item_id) AS rn FROM r) t WHERE rn = 1),
            neg AS (SELECT user_id, item_id AS neg_item, rating AS neg_r FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY rating ASC, item_id DESC) AS rn FROM r) t WHERE rn = 1),
            tr AS (SELECT ia.im - ib.im AS dd,
                     round(ln(1 + exp(-(ia.im - ib.im))), 6) AS loss
                   FROM pos p JOIN neg n USING (user_id)
                   JOIN im ia ON ia.item_id = p.pos_item
                   JOIN im ib ON ib.item_id = n.neg_item
                   WHERE p.pos_r > n.neg_r)
            SELECT CAST(count(*) AS BIGINT) AS n_triples,
                   CAST(sum(CASE WHEN round(dd, 6) > 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_correct,
                   round(avg(loss), 6) AS bpr_loss
            FROM tr""")
  )

  private val GdRank = 4
  private val GdLr = 2.0
  private val GdReg = 0.02
  private val GdEpochs = 3

  /** M5's training semantics, relationally — and ORACLE-CHECKED: 3
    * full-batch GD epochs of rank-4 MF on the mean-centered ratings
    * ([[graft.rec.GradientMF]]; ref trains its embeddings the same way,
    * `/root/reference/src/csv/train_rmse.py:121-141`), reporting the
    * per-epoch RMSE trajectory. The factor tables are LONG format
    * (id, f, val) with deterministic hash init, so the entire training
    * loop — predict, per-example-normalized gradient, update — unrolls
    * into SQL CTEs and DuckDB reproduces the training run to 6dp: the
    * gradient math itself is what the oracle verifies, not just a final
    * score. The fixture trajectory falls ~1.42 → ~1.28 over 3 epochs
    * (GdMfSpec asserts strict monotone descent; the oracle pins the
    * exact values). */
  val mfGdTraining = Q(
    "q86_mf_gd_training",
    (s, d) => graft.rec.GradientMF.trainTrajectory(
      Ratings.view(s, d), GdRank, GdLr, GdReg, GdEpochs),
    Some {
      def h32init(kind: String, idCol: String): String =
        s"(${OracleSql.h32(s"'$kind' || CAST($idCol AS VARCHAR) || '_' || CAST(f AS VARCHAR)")} % 1000 - 500) / 1000.0"
      val head = Seq(
        s"r0 AS MATERIALIZED ($rview)",
        "g AS MATERIALIZED (SELECT avg(rating) AS mu FROM r0)",
        "r AS MATERIALIZED (SELECT user_id, item_id, rating - mu AS res FROM r0 CROSS JOIN g)",
        s"fs AS (SELECT unnest(range($GdRank)) AS f)",
        s"u0 AS MATERIALIZED (SELECT user_id, f, ${h32init("u", "user_id")} AS val FROM (SELECT DISTINCT user_id FROM r) CROSS JOIN fs)",
        s"v0 AS MATERIALIZED (SELECT item_id, f, ${h32init("i", "item_id")} AS val FROM (SELECT DISTINCT item_id FROM r) CROSS JOIN fs)")
      def predCte(k: Int): String =
        s"""p$k AS MATERIALIZED (
            SELECT r.user_id, r.item_id, r.res,
                   sum(u.val * v.val) - r.res AS err
            FROM r JOIN u$k u ON r.user_id = u.user_id
                   JOIN v$k v ON r.item_id = v.item_id AND u.f = v.f
            GROUP BY r.user_id, r.item_id, r.res)"""
      val epochs = (0 until GdEpochs).map { k =>
        s"""${predCte(k)},
           gu$k AS MATERIALIZED (
             SELECT p.user_id, v.f, avg(p.err * v.val) AS grad
             FROM p$k p JOIN v$k v ON p.item_id = v.item_id GROUP BY 1, 2),
           gv$k AS MATERIALIZED (
             SELECT p.item_id, u.f, avg(p.err * u.val) AS grad
             FROM p$k p JOIN u$k u ON p.user_id = u.user_id GROUP BY 1, 2),
           u${k + 1} AS MATERIALIZED (
             SELECT u.user_id, u.f,
                    u.val - $GdLr * (g.grad + $GdReg * u.val) AS val
             FROM u$k u JOIN gu$k g ON u.user_id = g.user_id AND u.f = g.f),
           v${k + 1} AS MATERIALIZED (
             SELECT v.item_id, v.f,
                    v.val - $GdLr * (g.grad + $GdReg * v.val) AS val
             FROM v$k v JOIN gv$k g ON v.item_id = g.item_id AND v.f = g.f)"""
      }
      val losses = (0 to GdEpochs).map(k =>
        s"SELECT CAST($k AS BIGINT) AS epoch, round(sqrt(avg(err * err)), 6) AS rmse FROM p$k")
        .mkString("\nUNION ALL\n")
      s"""WITH ${(head ++ epochs :+ predCte(GdEpochs)).mkString(",\n")}
          SELECT * FROM ($losses) t ORDER BY epoch"""
    }
  )

  /** M5 — BPR TRAINING semantics, relationally and oracle-checked
    * (Rendle et al. 2009; the ref's top-N objective,
    * `/root/reference/src/csv/train_topn.py:98-109`): 3 full-batch
    * BPR-GD epochs over the deterministic per-user (pos, neg) pair
    * (q82's rule) via [[graft.rec.GradientMF.bprTrainTrajectory]]. The
    * trajectory is the evidence of learning — on the fixture the loss
    * falls ~0.70 → ~0.23 while pairwise accuracy rises ~0.50 → ~1.0 —
    * and the oracle reproduces the whole training run to 6dp, so the
    * sigmoid-gradient algebra itself is what's being checked. */
  /** Per-pair BPR score CTE at epoch `k` (needs tr/u$k/v$k in scope). */
  private def bprDCte(k: Int): String =
    s"""d$k AS MATERIALIZED (
        SELECT t.user_id, t.pos_item, t.neg_item,
               sum(u.val * (vp.val - vn.val)) AS d
        FROM tr t JOIN u$k u ON t.user_id = u.user_id
             JOIN v$k vp ON t.pos_item = vp.item_id AND vp.f = u.f
             JOIN v$k vn ON t.neg_item = vn.item_id AND vn.f = u.f
        GROUP BY 1, 2, 3)"""

  /** The unrolled BPR-GD training CTE chain (the q87 oracle's spine,
    * shared with q106 which trains on a SPLIT): from the ratings
    * relation `rDef` through the trained long-format factor tables
    * `u$GdEpochs` / `v$GdEpochs`. */
  private def bprOracleCtes(rDef: String): Seq[String] = {
    val lr = 1.0
    def h32init(kind: String, idCol: String): String =
      s"(${OracleSql.h32(s"'$kind' || CAST($idCol AS VARCHAR) || '_' || CAST(f AS VARCHAR)")} % 1000 - 500) / 1000.0"
    val head = Seq(
      s"r AS MATERIALIZED ($rDef)",
      """pos AS MATERIALIZED (SELECT user_id, item_id AS pos_item, rating AS pos_r FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY rating DESC, item_id) AS rn FROM r) t WHERE rn = 1)""",
      """neg AS MATERIALIZED (SELECT user_id, item_id AS neg_item, rating AS neg_r FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY rating ASC, item_id DESC) AS rn FROM r) t WHERE rn = 1)""",
      """tr AS MATERIALIZED (SELECT p.user_id, p.pos_item, n.neg_item
          FROM pos p JOIN neg n USING (user_id) WHERE p.pos_r > n.neg_r)""",
      s"fs AS (SELECT unnest(range($GdRank)) AS f)",
      s"u0 AS MATERIALIZED (SELECT user_id, f, ${h32init("u", "user_id")} AS val FROM (SELECT DISTINCT user_id FROM tr) CROSS JOIN fs)",
      s"""v0 AS MATERIALIZED (SELECT item_id, f, ${h32init("i", "item_id")} AS val FROM (
          SELECT pos_item AS item_id FROM tr UNION SELECT neg_item FROM tr) CROSS JOIN fs)""")
    val epochs = (0 until GdEpochs).map { k =>
      s"""${bprDCte(k)},
         s$k AS MATERIALIZED (
           SELECT *, 1.0 / (1.0 + exp(d)) AS comp FROM d$k),
         gu$k AS MATERIALIZED (
           SELECT s.user_id, vp.f, -s.comp * (vp.val - vn.val) AS grad
           FROM s$k s JOIN v$k vp ON s.pos_item = vp.item_id
                JOIN v$k vn ON s.neg_item = vn.item_id AND vn.f = vp.f),
         gv$k AS MATERIALIZED (
           SELECT item_id, f, avg(c) AS grad FROM (
             SELECT s.pos_item AS item_id, u.f, -s.comp * u.val AS c
             FROM s$k s JOIN u$k u ON s.user_id = u.user_id
             UNION ALL
             SELECT s.neg_item, u.f, s.comp * u.val
             FROM s$k s JOIN u$k u ON s.user_id = u.user_id) cc
           GROUP BY 1, 2),
         u${k + 1} AS MATERIALIZED (
           SELECT u.user_id, u.f, u.val - $lr * (g.grad + $GdReg * u.val) AS val
           FROM u$k u JOIN gu$k g ON u.user_id = g.user_id AND u.f = g.f),
         v${k + 1} AS MATERIALIZED (
           SELECT v.item_id, v.f, v.val - $lr * (g.grad + $GdReg * v.val) AS val
           FROM v$k v JOIN gv$k g ON v.item_id = g.item_id AND v.f = g.f)"""
    }
    head ++ epochs
  }

  val bprGdTraining = Q(
    "q87_bpr_gd_training",
    (s, d) => graft.rec.GradientMF.bprTrainTrajectory(
      Ratings.view(s, d), GdRank, lr = 1.0, reg = GdReg, GdEpochs),
    Some {
      val losses = (0 to GdEpochs).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS epoch,
            round(avg(ln(1 + exp(-d))), 6) AS bpr_loss,
            round(CAST(sum(CASE WHEN round(d, 6) > 0 THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*), 6) AS pair_acc FROM d$k""")
        .mkString("\nUNION ALL\n")
      s"""WITH ${(bprOracleCtes(rview) :+ bprDCte(GdEpochs)).mkString(",\n")}
          SELECT * FROM ($losses) t ORDER BY epoch"""
    }
  )

  /** M4+M5 COMPOSED — end-to-end LightGCN training, oracle-checked
    * (He et al. 2020; the ref's trainer
    * `/root/reference/src/csv/train_rmse.py:121-141`): q36's normalized
    * propagation is the FORWARD pass, and because propagation is
    * linear, BACKPROP through the graph is the same edge-weighted
    * aggregation applied to the gradient tables
    * ([[graft.rec.GradientMF.lightgcnTrainTrajectory]]). Per-epoch RMSE
    * of the propagated model falls ~1.41 → ~1.29 over 3 epochs on the
    * fixture; DuckDB reproduces the whole run — propagation, gradient
    * flow through the graph, updates — to 6dp. */
  /** Forward-propagation CTEs at epoch `k` (needs ed/r/u$k/v$k in
    * scope): the propagated tables up$k/vp$k and the per-rating error
    * relation p$k. */
  private def lightgcnFwdCte(k: Int): String =
    s"""up$k AS MATERIALIZED (
        SELECT u.user_id, u.f, (u.val + p.s) / 2 AS val
        FROM u$k u JOIN (
          SELECT e.user_id, v.f, sum(e.w * v.val) AS s
          FROM ed e JOIN v$k v ON e.item_id = v.item_id
          GROUP BY 1, 2) p ON u.user_id = p.user_id AND u.f = p.f),
       vp$k AS MATERIALIZED (
        SELECT v.item_id, v.f, (v.val + p.s) / 2 AS val
        FROM v$k v JOIN (
          SELECT e.item_id, u.f, sum(e.w * u.val) AS s
          FROM ed e JOIN u$k u ON e.user_id = u.user_id
          GROUP BY 1, 2) p ON v.item_id = p.item_id AND v.f = p.f),
       p$k AS MATERIALIZED (
        SELECT r.user_id, r.item_id, r.res,
               sum(up.val * vp.val) - r.res AS err
        FROM r JOIN up$k up ON r.user_id = up.user_id
               JOIN vp$k vp ON r.item_id = vp.item_id AND up.f = vp.f
        GROUP BY r.user_id, r.item_id, r.res)"""

  /** The unrolled LightGCN training CTE chain (the q88 oracle's spine,
    * shared with q107 which trains on a SPLIT): from a raw ratings
    * relation named `rin` through the final propagated factor tables
    * `up$GdEpochs` / `vp$GdEpochs` (emitted by the trailing
    * [[lightgcnFwdCte]]), with the train mean in `g` and the training
    * residuals in `r`. */
  private def lightgcnOracleCtes: Seq[String] = {
    val lr = 16.0
    def h32init(kind: String, idCol: String): String =
      s"(${OracleSql.h32(s"'$kind' || CAST($idCol AS VARCHAR) || '_' || CAST(f AS VARCHAR)")} % 1000 - 500) / 1000.0"
    val head = Seq(
      "g AS MATERIALIZED (SELECT avg(rating) AS mu FROM rin)",
      "r AS MATERIALIZED (SELECT user_id, item_id, rating - mu AS res FROM rin CROSS JOIN g)",
      """du AS MATERIALIZED (SELECT user_id, count(*) AS du FROM r GROUP BY 1)""",
      """di AS MATERIALIZED (SELECT item_id, count(*) AS di FROM r GROUP BY 1)""",
      """ed AS MATERIALIZED (SELECT r.user_id, r.item_id,
            1.0 / sqrt(du.du * di.di) AS w
          FROM r JOIN du USING (user_id) JOIN di USING (item_id))""",
      s"fs AS (SELECT unnest(range($GdRank)) AS f)",
      s"u0 AS MATERIALIZED (SELECT user_id, f, ${h32init("u", "user_id")} AS val FROM (SELECT DISTINCT user_id FROM r) CROSS JOIN fs)",
      s"v0 AS MATERIALIZED (SELECT item_id, f, ${h32init("i", "item_id")} AS val FROM (SELECT DISTINCT item_id FROM r) CROSS JOIN fs)")
    val epochs = (0 until GdEpochs).map { k =>
      s"""${lightgcnFwdCte(k)},
           gup$k AS MATERIALIZED (
             SELECT p.user_id, vp.f, avg(p.err * vp.val) AS grad
             FROM p$k p JOIN vp$k vp ON p.item_id = vp.item_id
             GROUP BY 1, 2),
           gvp$k AS MATERIALIZED (
             SELECT p.item_id, up.f, avg(p.err * up.val) AS grad
             FROM p$k p JOIN up$k up ON p.user_id = up.user_id
             GROUP BY 1, 2),
           gu$k AS MATERIALIZED (
             SELECT a.user_id, a.f, (a.grad + b.s) / 2 AS grad
             FROM gup$k a JOIN (
               SELECT e.user_id, gv.f, sum(e.w * gv.grad) AS s
               FROM ed e JOIN gvp$k gv ON e.item_id = gv.item_id
               GROUP BY 1, 2) b ON a.user_id = b.user_id AND a.f = b.f),
           gv$k AS MATERIALIZED (
             SELECT a.item_id, a.f, (a.grad + b.s) / 2 AS grad
             FROM gvp$k a JOIN (
               SELECT e.item_id, gu.f, sum(e.w * gu.grad) AS s
               FROM ed e JOIN gup$k gu ON e.user_id = gu.user_id
               GROUP BY 1, 2) b ON a.item_id = b.item_id AND a.f = b.f),
           u${k + 1} AS MATERIALIZED (
             SELECT u.user_id, u.f, u.val - $lr * (g.grad + $GdReg * u.val) AS val
             FROM u$k u JOIN gu$k g ON u.user_id = g.user_id AND u.f = g.f),
           v${k + 1} AS MATERIALIZED (
             SELECT v.item_id, v.f, v.val - $lr * (g.grad + $GdReg * v.val) AS val
             FROM v$k v JOIN gv$k g ON v.item_id = g.item_id AND v.f = g.f)"""
    }
    head ++ epochs
  }

  val lightgcnTraining = Q(
    "q88_lightgcn_training",
    (s, d) => graft.rec.GradientMF.lightgcnTrainTrajectory(
      Ratings.view(s, d), GdRank, lr = 16.0, reg = GdReg, GdEpochs),
    Some {
      val losses = (0 to GdEpochs).map(k =>
        s"SELECT CAST($k AS BIGINT) AS epoch, round(sqrt(avg(err * err)), 6) AS rmse FROM p$k")
        .mkString("\nUNION ALL\n")
      s"""WITH ${(Seq(s"rin AS MATERIALIZED ($rview)") ++ lightgcnOracleCtes
          :+ lightgcnFwdCte(GdEpochs)).mkString(",\n")}
          SELECT * FROM ($losses) t ORDER BY epoch"""
    }
  )

  /** q88's trainer evaluated on a HELD-OUT split — generalization in
    * the oracle-checked catalog (GdMfSpec anchors the same holdout to
    * the reference's published 0.9097 at the ml-100k shape; this runs
    * the identical machinery at catalog scale with a full oracle):
    * train LightGCN on the (user+item)%4≠0 split, score the %4=0
    * holdout with the final PROPAGATED embeddings, report
    * `(n_test, baseline_rmse, test_rmse)` where the baseline predicts
    * the train mean. Pairs whose user or item never appears in
    * training drop (the standard known-entity evaluation — the inner
    * factor joins do it on both engines). The oracle unrolls training
    * AND holdout scoring in one CTE chain, so what DuckDB verifies is
    * that the model evaluated on unseen data is exactly the model the
    * gradient algebra produces. */
  val lightgcnHoldoutEval = Q(
    "q107_lightgcn_holdout",
    (s, d) => {
      val r = Ratings.view(s, d)
      val test = r.where((col("user_id") + col("item_id")) % 4 === 0)
      val train = r.where((col("user_id") + col("item_id")) % 4 =!= 0)
      graft.rec.GradientMF.lightgcnHoldout(
        train, test, GdRank, lr = 16.0, reg = GdReg, GdEpochs)
    },
    Some {
      val e = GdEpochs
      val split = Seq(
        s"r0 AS MATERIALIZED ($rview)",
        "test AS MATERIALIZED (SELECT * FROM r0 WHERE (user_id + item_id) % 4 = 0)",
        "rin AS MATERIALIZED (SELECT * FROM r0 WHERE (user_id + item_id) % 4 <> 0)")
      val eval = Seq(
        """ts AS (SELECT t.user_id, t.item_id, t.rating - g.mu AS res
            FROM test t CROSS JOIN g)""",
        s"""pe AS MATERIALIZED (
            SELECT ts.user_id, ts.item_id, ts.res,
                   sum(up.val * vp.val) - ts.res AS err
            FROM ts JOIN up$e up ON ts.user_id = up.user_id
                 JOIN vp$e vp ON ts.item_id = vp.item_id AND vp.f = up.f
            GROUP BY 1, 2, 3)""")
      s"""WITH ${(split ++ lightgcnOracleCtes ++ Seq(lightgcnFwdCte(e))
          ++ eval).mkString(",\n")}
          SELECT CAST(count(*) AS BIGINT) AS n_test,
                 round(sqrt(avg(res * res)), 6) AS baseline_rmse,
                 round(sqrt(avg(err * err)), 6) AS test_rmse
          FROM pe"""
    }
  )

  /** q34's ranking computed by the BOUNDED-STATE path: per-user top-3
    * via [[graft.expr.TopKPairs]] (a size-k typed Aggregator that
    * combines map-side) + posexplode, instead of the window's per-user
    * full sort. IDENTICAL results and oracle to q34 — what differs is
    * the failure mode under SKEW: a power user with a million ratings
    * contributes k pairs to this shuffle, vs a million-row sort run
    * inside one window task. On the fixture's benign degree (~30
    * ratings/user) the codegen'd window sort is measurably the better
    * plan (1.57 s vs 1.84 s at sf0.1 — typed ser/de isn't free), so the
    * catalog keeps BOTH idioms: q34 as the default, this as the shape
    * you switch to when the key distribution turns hostile. PlanSpec
    * asserts the no-Window/ObjectHashAggregate shape. */
  val userTopkAgg = Q(
    "q95_user_topk_agg",
    (s, d) => {
      val topk = graft.expr.TopKPairs.agg(3)
      Ratings.view(s, d)
        .groupBy(col("user_id"))
        .agg(topk(col("rating"), col("item_id")).as("top"))
        .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("user_id"), col("p._2").as("item_id"),
          round(col("p._1"), 6).as("rating"),
          (col("pos") + 1).cast("long").as("rank"))
        .orderBy(col("user_id"), col("rank"))
    },
    userTopk.oracle
  )

  /** Top-N serving + P@k/R@k from trained factor tables `(uf, vf)` —
    * the serving/metric half of q106, shared with the ml-100k quality
    * anchor (GdMfSpec runs it over all users of the fixture): rank
    * every trained item per probe user by the 6dp-rounded factor dot
    * product (item tiebreak — the q82/q100 cross-engine ranking idiom),
    * drop the user's train items, score the top-k against the holdout,
    * and average h/k and h/n_test over the probe users. `probeLimit`
    * ≤ 0 means ALL trained users (the published-metric convention);
    * positive bounds the probe set (q106 uses 50). Scale shape: the
    * candidate score is probe users × item-factor table — the item side
    * streams and the probe factors broadcast; ranking windows over
    * bounded per-user groups; everything else is equi-joins. */
  private[graft] def topNMetric(uf: DataFrame, vf: DataFrame,
      train: DataFrame, test: DataFrame, k: Int,
      probeLimit: Int, width: Int): DataFrame = {
    val allProbes = uf.select(col("user_id")).orderBy(col("user_id"))
    val probe = if (probeLimit > 0) allProbes.limit(probeLimit) else allProbes
    val pu = uf.join(broadcast(probe), Seq("user_id"))
      .select(col("user_id"), col("val").as("uval"))
    // statically-expanded dot (bit-identical fold; codegen'd — this
    // runs once per probe×item candidate row, the metric's hot path)
    val dotScore = round(graft.expr.GraftFunctions.dotProductFixed(
      col("uval"), col("vval"), width), 6)
    val ranked = vf.select(col("item_id"), col("val").as("vval"))
      .crossJoin(broadcast(pu))
      .select(col("user_id"), col("item_id"), dotScore.as("score"))
      .join(train.select(col("user_id"), col("item_id")),
        Seq("user_id", "item_id"), "left_anti")
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("user_id"))
        .orderBy(col("score").desc, col("item_id"))))
      .where(col("rank") <= k)
    val nt = test.groupBy(col("user_id")).agg(count(lit(1)).as("n_test"))
      .join(broadcast(probe), Seq("user_id"))
    val hits = ranked
      .join(test.select(col("user_id"), col("item_id")),
        Seq("user_id", "item_id"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("h"))
    nt.join(hits, Seq("user_id"), "left")
      .select(coalesce(col("h"), lit(0L)).as("h"), col("n_test"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("h") / k.toDouble), 6).as(s"p_at_$k"),
        round(avg(col("h").cast("double") / col("n_test")), 6)
          .as(s"r_at_$k"))
  }

  /** The reference's HEADLINE top-N metric computed END-TO-END from
    * TRAINED factors (ref `src/csv/train_topn.py:112-145` reports
    * P@20/R@20 of the BPR-trained LightGCN): train q87's BPR factors on
    * a deterministic split (q35's (user+item)%4 holdout rule), rank
    * every trained item per probe user by the factor dot product
    * (6dp-rounded, item tiebreak — the q82/q100 cross-engine ranking
    * idiom), drop the user's train items, and score the top-20 against
    * the holdout — so the ORACLE reproduces training AND serving AND
    * metric in one CTE chain. Where q35 metered a fixed popularity
    * scorer, this is the metric on the learned model. Scale shape: the
    * candidate score is probe-users (bounded, 50) × item-factor table —
    * the item side streams and the probe factors broadcast; ranking
    * windows over 50 bounded groups; everything else is equi-joins on
    * (user, item). */
  val bprTopnMetric = Q(
    "q106_bpr_topn_metric",
    (s, d) => {
      val r = Ratings.view(s, d).cache()
      val test = r.where((col("user_id") + col("item_id")) % 4 === 0)
      val train = r.where((col("user_id") + col("item_id")) % 4 =!= 0)
      val (uf, vf) = graft.rec.GradientMF.bprTrainedFactors(
        train, GdRank, lr = 1.0, reg = GdReg, GdEpochs)
      topNMetric(uf, vf, train, test, k = 20, probeLimit = 50,
        width = GdRank)
    },
    Some {
      val e = GdEpochs
      val metric = Seq(
        s"""pu AS (SELECT user_id FROM (SELECT DISTINCT user_id FROM u$e)
            ORDER BY user_id LIMIT 50)""",
        s"""sc AS MATERIALIZED (
            SELECT u.user_id, v.item_id, round(sum(u.val * v.val), 6) AS score
            FROM u$e u JOIN pu USING (user_id)
                 JOIN v$e v ON v.f = u.f
            GROUP BY 1, 2)""",
        """cand AS (SELECT s.user_id, s.item_id, s.score
            FROM sc s LEFT JOIN r t
              ON t.user_id = s.user_id AND t.item_id = s.item_id
            WHERE t.user_id IS NULL)""",
        """top AS (SELECT user_id, item_id FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY score DESC, item_id) AS rank FROM cand) rk
            WHERE rank <= 20)""",
        """nt AS (SELECT user_id, count(*) AS n_test
            FROM test JOIN pu USING (user_id) GROUP BY 1)""",
        """hits AS (SELECT t.user_id, count(*) AS h
            FROM top t JOIN test e
              ON e.user_id = t.user_id AND e.item_id = t.item_id
            GROUP BY 1)""")
      val split = Seq(
        s"r0 AS MATERIALIZED ($rview)",
        "test AS MATERIALIZED (SELECT * FROM r0 WHERE (user_id + item_id) % 4 = 0)")
      val train = "SELECT * FROM r0 WHERE (user_id + item_id) % 4 <> 0"
      s"""WITH ${(split ++ bprOracleCtes(train) ++ metric).mkString(",\n")}
          SELECT CAST(count(*) AS BIGINT) AS n_users,
                 round(avg(coalesce(h, 0) / 20.0), 6) AS p_at_20,
                 round(avg(CAST(coalesce(h, 0) AS DOUBLE) / n_test), 6) AS r_at_20
          FROM nt LEFT JOIN hits USING (user_id)"""
    }
  )

  val all: Seq[Q] = Seq(itemCf, rmseBaseline, userTopk, precisionRecall,
    graphPropagation, graphPropagationK2, alsRecs, alsServeFixed,
    multiclassAccuracy, weightedLoss, bprLoss, mfGdTraining, bprGdTraining,
    lightgcnTraining, userTopkAgg, bprTopnMetric, lightgcnHoldoutEval)
}
