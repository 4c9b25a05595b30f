package graft.rec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-batch gradient-descent matrix factorization, expressed entirely
  * as joins + aggregations (M5's training semantics, relationally): the
  * reference trains its embeddings by gradient descent on rating error
  * (`/root/reference/src/csv/train_rmse.py:121-141`; MF-GD per Koren et
  * al. 2009), and this is that loop with factor tables in LONG format —
  * `(id, f, val)` — so the rank is data, not schema, and every training
  * step is a bounded-key shuffle:
  *
  *  - predict: ratings ⋈ U ⋈ V, `sum(u·v)` grouped by (user, item);
  *  - gradient: prediction error ⋈ the opposite factor table, `avg`
  *    grouped by (id, f) — per-example-normalized so step size is
  *    degree-independent (a power user's gradient is the mean over
  *    their ratings, not the sum);
  *  - update: `val ← val − lr·(grad + λ·val)`, a 1:1 join.
  *
  * Each epoch's factor tables are eagerly `localCheckpoint`ed — the
  * update references its input twice (gradient + update term), so as
  * with q72's pointer jumping, lineage truncation per round is what
  * keeps the Catalyst plan constant-size across epochs. At cluster
  * scale the checkpoint becomes a factor-table materialization per
  * epoch, which is what every iterative trainer on Spark does (MLlib
  * ALS checkpoints the same way).
  *
  * Determinism: factors initialize from the shared md5-prefix hash
  * (exact integers → exact doubles in [−0.5, 0.499]), the global mean
  * is subtracted from ratings (the residual model), and the whole loop
  * is pure joins/aggs — so the identical computation is expressible as
  * unrolled SQL CTEs and the TRAINING ITSELF is oracle-checkable
  * (q86_mf_gd_training).
  */
object GradientMF {

  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Deterministic hash-init factor value in [-0.5, 0.499]. */
  private def initVal(kind: String, id: Column, f: Column): Column =
    ((h32(concat(lit(kind), id.cast("string"), lit("_"), f.cast("string")))
      % 1000) - 500).cast("double") / 1000.0

  /** Train `epochs` full-batch GD epochs of rank-`rank` MF on
    * `ratings` (user_id, item_id, rating); returns the per-epoch RMSE
    * trajectory `(epoch, rmse)` — epochs+1 rows, epoch 0 = the loss at
    * initialization. */
  def trainTrajectory(ratings: DataFrame, rank: Int, lr: Double,
                      reg: Double, epochs: Int): DataFrame = {
    val g = ratings.agg(avg(col("rating")).as("mu"))
    val res = ratings.crossJoin(broadcast(g))
      .select(col("user_id"), col("item_id"),
        (col("rating") - col("mu")).as("res"))
      .cache()
    val fs = res.sparkSession.range(rank).select(col("id").as("f"))

    def init(kind: String, idCol: String): DataFrame =
      res.select(col(idCol)).distinct()
        .crossJoin(broadcast(fs))
        .select(col(idCol), col("f"),
          initVal(kind, col(idCol), col("f")).as("val"))

    def predictions(u: DataFrame, v: DataFrame): DataFrame =
      res
        .join(u.select(col("user_id"), col("f"), col("val").as("uv")),
          Seq("user_id"))
        .join(v.select(col("item_id"), col("f"), col("val").as("vv")),
          Seq("item_id", "f"))
        .groupBy(col("user_id"), col("item_id"), col("res"))
        .agg((sum(col("uv") * col("vv")) - col("res")).as("err"))

    def epochLoss(k: Int, p: DataFrame): DataFrame =
      p.agg(round(sqrt(avg(col("err") * col("err"))), 6).as("rmse"))
        .select(lit(k).cast("long").as("epoch"), col("rmse"))

    var u = init("u", "user_id").localCheckpoint(true)
    var v = init("i", "item_id").localCheckpoint(true)
    val losses = Seq.newBuilder[DataFrame]
    for (k <- 0 until epochs) {
      // p feeds the loss and BOTH gradients — checkpoint once per epoch
      val p = predictions(u, v).localCheckpoint(true)
      losses += epochLoss(k, p)
      val gu = p.join(v, Seq("item_id"))
        .groupBy(col("user_id"), col("f"))
        .agg(avg(col("err") * col("val")).as("grad"))
      val gv = p.join(u, Seq("user_id"))
        .groupBy(col("item_id"), col("f"))
        .agg(avg(col("err") * col("val")).as("grad"))
      u = u.join(gu, Seq("user_id", "f"))
        .select(col("user_id"), col("f"),
          (col("val") - lit(lr) * (col("grad") + lit(reg) * col("val"))).as("val"))
        .localCheckpoint(true)
      v = v.join(gv, Seq("item_id", "f"))
        .select(col("item_id"), col("f"),
          (col("val") - lit(lr) * (col("grad") + lit(reg) * col("val"))).as("val"))
        .localCheckpoint(true)
    }
    losses += epochLoss(epochs, predictions(u, v))
    losses.result().reduce(_ unionAll _).orderBy(col("epoch"))
  }

  /** Full-batch BPR gradient descent (Rendle et al. 2009 — the ref's
    * top-N training objective, `/root/reference/src/csv/train_topn.py:
    * 98-109`) over the deterministic per-user (pos, neg) item pair
    * (q82's triple rule: top-rated vs bottom-rated, kept where the
    * ratings strictly differ). Same long-format factors, hash init and
    * per-epoch checkpointing as [[trainTrajectory]]; the pairwise score
    * is d = u·(v_pos − v_neg), the loss ln(1+e^−d), and the gradients
    * ride the closed form dL/dd = −1/(1+e^d). Returns the per-epoch
    * `(epoch, bpr_loss, pair_acc)` trajectory — loss falling and the
    * share of correctly-ordered pairs rising is BPR learning, and both
    * are oracle-checked (q87). */
  def bprTrainTrajectory(ratings: DataFrame, rank: Int, lr: Double,
                         reg: Double, epochs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPos = Window.partitionBy(col("user_id"))
      .orderBy(col("rating").desc, col("item_id"))
    val wNeg = Window.partitionBy(col("user_id"))
      .orderBy(col("rating").asc, col("item_id").desc)
    val pos = ratings.withColumn("rn", row_number().over(wPos))
      .where(col("rn") === 1)
      .select(col("user_id"), col("item_id").as("pos_item"),
        col("rating").as("pos_r"))
    val neg = ratings.withColumn("rn", row_number().over(wNeg))
      .where(col("rn") === 1)
      .select(col("user_id"), col("item_id").as("neg_item"),
        col("rating").as("neg_r"))
    val tr = pos.join(neg, Seq("user_id"))
      .where(col("pos_r") > col("neg_r"))
      .select(col("user_id"), col("pos_item"), col("neg_item"))
      .cache()
    val fs = ratings.sparkSession.range(rank).select(col("id").as("f"))

    def init(kind: String, ids: DataFrame, idCol: String): DataFrame =
      ids.crossJoin(broadcast(fs))
        .select(col(idCol), col("f"),
          initVal(kind, col(idCol), col("f")).as("val"))

    def scores(u: DataFrame, v: DataFrame): DataFrame =
      tr
        .join(u.select(col("user_id"), col("f"), col("val").as("uval")),
          Seq("user_id"))
        .join(v.select(col("item_id").as("pos_item"), col("f"),
          col("val").as("pval")), Seq("pos_item", "f"))
        .join(v.select(col("item_id").as("neg_item"), col("f"),
          col("val").as("nval")), Seq("neg_item", "f"))
        .groupBy(col("user_id"), col("pos_item"), col("neg_item"))
        .agg(sum(col("uval") * (col("pval") - col("nval"))).as("d"))

    def epochLoss(k: Int, d: DataFrame): DataFrame =
      d.agg(
          round(avg(log(lit(1.0) + exp(-col("d")))), 6).as("bpr_loss"),
          round(sum(when(round(col("d"), 6) > 0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("pair_acc"))
        .select(lit(k).cast("long").as("epoch"), col("bpr_loss"),
          col("pair_acc"))

    var u = init("u", tr.select(col("user_id")).distinct(), "user_id")
      .localCheckpoint(true)
    var v = init("i",
      tr.select(col("pos_item").as("item_id"))
        .unionAll(tr.select(col("neg_item").as("item_id"))).distinct(),
      "item_id").localCheckpoint(true)
    val losses = Seq.newBuilder[DataFrame]
    for (k <- 0 until epochs) {
      val d = scores(u, v).localCheckpoint(true)
      losses += epochLoss(k, d)
      val s = d.withColumn("comp", lit(1.0) / (lit(1.0) + exp(col("d"))))
      val gu = s
        .join(v.select(col("item_id").as("pos_item"), col("f"),
          col("val").as("pval")), Seq("pos_item"))
        .join(v.select(col("item_id").as("neg_item"), col("f"),
          col("val").as("nval")), Seq("neg_item", "f"))
        .select(col("user_id"), col("f"),
          (-col("comp") * (col("pval") - col("nval"))).as("g"))
        // one (pos, neg) pair per user today, but aggregate symmetrically
        // with gv so the update join stays 1:1 per (user_id, f) even if
        // the pair derivation ever yields multiple pairs per user
        .groupBy(col("user_id"), col("f"))
        .agg(avg(col("g")).as("grad"))
      val su = s.join(u.select(col("user_id"), col("f"),
        col("val").as("uval")), Seq("user_id"))
      val gv = su.select(col("pos_item").as("item_id"), col("f"),
          (-col("comp") * col("uval")).as("c"))
        .unionAll(su.select(col("neg_item").as("item_id"), col("f"),
          (col("comp") * col("uval")).as("c")))
        .groupBy(col("item_id"), col("f"))
        .agg(avg(col("c")).as("grad"))
      u = u.join(gu, Seq("user_id", "f"))
        .select(col("user_id"), col("f"),
          (col("val") - lit(lr) * (col("grad") + lit(reg) * col("val"))).as("val"))
        .localCheckpoint(true)
      v = v.join(gv, Seq("item_id", "f"))
        .select(col("item_id"), col("f"),
          (col("val") - lit(lr) * (col("grad") + lit(reg) * col("val"))).as("val"))
        .localCheckpoint(true)
    }
    losses += epochLoss(epochs, scores(u, v))
    losses.result().reduce(_ unionAll _).orderBy(col("epoch"))
  }

  /** END-TO-END LightGCN training (He et al. 2020; the ref's actual
    * trainer, `/root/reference/src/csv/train_rmse.py:121-141`), K=1
    * with layer averaging, as full-batch GD through the propagation:
    *
    *  - forward: propagated embeddings `U' = (U + ÃV)/2`,
    *    `V' = (V + ÃᵀU)/2` over the 1/√(d_u·d_i)-normalized bipartite
    *    edges (q36's propagation), prediction `u'·v'` on mean-centered
    *    ratings;
    *  - backward: because the propagation is LINEAR, backprop through
    *    it is the SAME edge-weighted aggregation applied to the
    *    gradient tables — `∂L/∂U = (G_U' + Ã G_V')/2` — so "gradients
    *    flow through the graph" is literally one more join+agg per
    *    side, and the whole trainer stays relational;
    *  - update: `val ← val − lr·(grad + λ·val)` on the BASE tables.
    *
    * Per-example-mean gradient normalization and per-epoch
    * checkpointing as [[trainTrajectory]]. Returns the per-epoch RMSE
    * of the PROPAGATED model — the quantity LightGCN actually trains —
    * and the full run (propagation + backprop + updates) unrolls into
    * SQL, so q88's oracle verifies gradient flow through the graph. */
  def lightgcnTrainTrajectory(ratings: DataFrame, rank: Int, lr: Double,
                              reg: Double, epochs: Int): DataFrame = {
    val g = ratings.agg(avg(col("rating")).as("mu"))
    val res = ratings.crossJoin(broadcast(g))
      .select(col("user_id"), col("item_id"),
        (col("rating") - col("mu")).as("res"))
      .cache()
    val du = res.groupBy(col("user_id")).agg(count(lit(1)).as("du"))
    val di = res.groupBy(col("item_id")).agg(count(lit(1)).as("di"))
    val ed = res.join(du, Seq("user_id")).join(di, Seq("item_id"))
      .select(col("user_id"), col("item_id"),
        (lit(1.0) / sqrt(col("du") * col("di"))).as("w"))
      .cache()
    val fs = res.sparkSession.range(rank).select(col("id").as("f"))

    def init(kind: String, idCol: String): DataFrame =
      res.select(col(idCol)).distinct()
        .crossJoin(broadcast(fs))
        .select(col(idCol), col("f"),
          initVal(kind, col(idCol), col("f")).as("val"))

    /** (base + Σ_edge w·other)/2 — the forward half-layer; with a
      * gradient table as `other` it is equally the backward pass. */
    def mix(base: DataFrame, other: DataFrame, baseId: String,
            otherId: String, valCol: String): DataFrame = {
      val agg = ed.join(
          other.select(col(otherId), col("f"), col(valCol).as("ov")),
          Seq(otherId))
        .groupBy(col(baseId), col("f"))
        .agg(sum(col("w") * col("ov")).as("s"))
      base.join(agg, Seq(baseId, "f"))
        .select(col(baseId), col("f"),
          ((col(valCol) + col("s")) / 2).as(valCol))
    }

    def predictions(up: DataFrame, vp: DataFrame): DataFrame =
      res
        .join(up.select(col("user_id"), col("f"), col("val").as("uv")),
          Seq("user_id"))
        .join(vp.select(col("item_id"), col("f"), col("val").as("vv")),
          Seq("item_id", "f"))
        .groupBy(col("user_id"), col("item_id"), col("res"))
        .agg((sum(col("uv") * col("vv")) - col("res")).as("err"))

    def epochLoss(k: Int, p: DataFrame): DataFrame =
      p.agg(round(sqrt(avg(col("err") * col("err"))), 6).as("rmse"))
        .select(lit(k).cast("long").as("epoch"), col("rmse"))

    var u = init("u", "user_id").localCheckpoint(true)
    var v = init("i", "item_id").localCheckpoint(true)
    val losses = Seq.newBuilder[DataFrame]
    for (k <- 0 until epochs) {
      val up = mix(u, v, "user_id", "item_id", "val").localCheckpoint(true)
      val vp = mix(v, u, "item_id", "user_id", "val").localCheckpoint(true)
      val p = predictions(up, vp).localCheckpoint(true)
      losses += epochLoss(k, p)
      val gup = p.join(vp, Seq("item_id"))
        .groupBy(col("user_id"), col("f"))
        .agg(avg(col("err") * col("val")).as("grad")).cache()
      val gvp = p.join(up, Seq("user_id"))
        .groupBy(col("item_id"), col("f"))
        .agg(avg(col("err") * col("val")).as("grad")).cache()
      val gu = mix(gup, gvp, "user_id", "item_id", "grad")
      val gv = mix(gvp, gup, "item_id", "user_id", "grad")
      u = u.join(gu, Seq("user_id", "f"))
        .select(col("user_id"), col("f"),
          (col("val") - lit(lr) * (col("grad") + lit(reg) * col("val"))).as("val"))
        .localCheckpoint(true)
      v = v.join(gv, Seq("item_id", "f"))
        .select(col("item_id"), col("f"),
          (col("val") - lit(lr) * (col("grad") + lit(reg) * col("val"))).as("val"))
        .localCheckpoint(true)
    }
    losses += epochLoss(epochs, predictions(
      mix(u, v, "user_id", "item_id", "val"),
      mix(v, u, "item_id", "user_id", "val")))
    losses.result().reduce(_ unionAll _).orderBy(col("epoch"))
  }
}
