package graft.cypher

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every Cypher string the reference issues runs VERBATIM against the
  * engine (the S2/S3 migration story, executable): each test quotes the
  * literal query from the reference source (file:line) and checks the
  * result against the same relation computed directly on the ratings
  * view — including Neo4j's actual semantics for the reference's latent
  * traps (case-sensitive properties, untyped edge variables, MERGE
  * whole-pattern matching).
  */
class CypherCompatSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def ratings = graft.rec.Ratings.view(spark, sfDir).cache()

  private def freshGraph = MovieGraph(spark, sfDir)

  test("ratings-triple read (spark_als.py:146-149, distributed.py:152-155)") {
    val got = freshGraph.read(
      "MATCH (u:User)-[r:Rate]->(m:Movie) " +
      "RETURN u.UserID AS user_id, m.MovieID AS movie_id, r.Rating AS rating")
      .as[(Long, Long, Double)].collect().toSet
    val want = ratings.select($"user_id", $"item_id", $"rating")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("movie node scan (distributed.py:222)") {
    val got = freshGraph.read("MATCH (m:Movie) RETURN m.MovieID AS movie_id")
      .as[Long].collect().toSet
    val want = ratings.select($"item_id").distinct().as[Long].collect().toSet
    assert(got == want)
  }

  test("SET + key-filtered read-back (streaming_rec.py:74,96,102-104)") {
    val g = freshGraph
    val anyUser = ratings.select($"user_id").orderBy($"user_id").as[Long].head()
    val zeros = Seq.fill(18)("0.0").mkString(",")
    // init: one property write to every User node (streaming_rec.py:74)
    g.write(s"MATCH (u:User) SET u.Interest = '$zeros';")
    // update one user's vector (streaming_rec.py:102-104)
    val v = (1 to 18).map(i => (i / 10.0).toString).mkString(",")
    g.write(s"MATCH (u:User{UserID:$anyUser}) SET u.Interest = '$v';")
    // read it back (streaming_rec.py:96)
    val got = g.read(s"MATCH (u:User{UserID:$anyUser}) " +
      "RETURN u.UserID AS user_id, u.Interest AS interest")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((anyUser, v)))
    // every OTHER user still has the init vector
    val others = g.read(
      "MATCH (u:User) RETURN u.UserID AS user_id, u.Interest AS interest")
      .as[(Long, String)].collect()
    assert(others.length > 1 &&
      others.forall { case (u, i) => i == (if (u == anyUser) v else zeros) })
  }

  test("property names are case-sensitive: u.interest is null after SET " +
      "u.Interest (streaming_rec.py:74 vs :229-231 — the reference's own " +
      "latent bug, reproduced)") {
    val g = freshGraph
    g.write("MATCH (u:User) SET u.Interest = '0.0,0.0';")
    val rows = g.read(
      "MATCH (u:User) RETURN u.UserID AS user_id, u.interest AS interest")
      .select($"interest").collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(0)))
  }

  test("cold-start popular movies: WITH + COUNT + WHERE + re-MATCH + AVG " +
      "+ ORDER BY (cold_rec.py:58-62)") {
    val m = 2
    val got = freshGraph.read(
      "MATCH (User)-[r:Rate]->(m:Movie) " +
      s"WITH m, COUNT(r) AS cnt WHERE cnt > $m " +
      "MATCH (User)-[r:Rate]->(m) " +
      "RETURN m.MovieID AS movie_id, AVG(r.Rating) AS avg_rating " +
      "ORDER BY avg_rating DESC")
      .as[(Long, Double)].collect().toSeq
    val want = ratings.groupBy($"item_id")
      .agg(count(lit(1)).as("cnt"), avg($"rating").as("avg_rating"))
      .where($"cnt" > m)
      .select($"item_id", $"avg_rating")
      .as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty &&
      got.map(t => (t._1, math.rint(t._2 * 1e9))).toSet ==
      want.map(t => (t._1, math.rint(t._2 * 1e9))).toSet)
    // ORDER BY honored
    assert(got.map(_._2) == got.map(_._2).sorted(Ordering[Double].reverse))
  }

  test("new movies: anonymous node + COUNT < k (cold_rec.py:71-75)") {
    val k = 3
    val got = freshGraph.read(
      "MATCH (:User)-[r:Rate]->(m:Movie) " +
      s"WITH m, COUNT(r) AS cnt WHERE cnt < $k " +
      "RETURN m.MovieID AS movie_id")
      .as[Long].collect().toSet
    val want = ratings.groupBy($"item_id").agg(count(lit(1)).as("cnt"))
      .where($"cnt" < k).select($"item_id").as[Long].collect().toSet
    assert(got == want)
  }

  test("watched movies via unlabeled variable + untyped edge " +
      "(recommend.py:115-116, distributed.py:244-245): [Rate] is an edge " +
      "VARIABLE matching every relationship type — Neo4j semantics, " +
      "reproduced") {
    val g = freshGraph
    val u = ratings.select($"user_id").orderBy($"user_id").as[Long].head()
    val rated = ratings.where($"user_id" === u)
      .select($"item_id").as[Long].collect().toSet
    val q = s"MATCH (User{UserID:$u})-[Rate]->(m:Movie) RETURN m.MovieID"
    val before = g.read(q)
    // unaliased RETURN keeps the connector's literal column name
    assert(before.columns.toSeq == Seq("m.MovieID"))
    assert(before.as[Long].collect().toSet == rated)
    // after a Recommend edge exists, the untyped [Rate] VARIABLE matches
    // it too — the trap the reference's bare-[Rate] queries walk into
    g.write(
      s"MATCH (u:User{UserID:$u}) WITH u " +
      s"MATCH (m:Movie{MovieID:${rated.max}}) WITH u, m " +
      "MERGE (u)-[:Recommend{Score:0.91}]->(m)")
    assert(g.read(q).as[Long].collect().toSet == rated) // rated.max already rated — set unchanged
  }

  test("MERGE recommendation edges + typed read-back + whole-pattern " +
      "match semantics (recommend.py:89-91, distributed.py:282-284)") {
    val g = freshGraph
    val u = ratings.select($"user_id").orderBy($"user_id").as[Long].head()
    val ms = ratings.select($"item_id").distinct()
      .orderBy($"item_id").as[Long].take(2)
    g.write(
      s"MATCH (u:User{UserID:$u}) WITH u " +
      s"MATCH (m:Movie{MovieID:${ms(0)}}) WITH u, m " +
      "MERGE (u)-[:Recommend{Score:0.75}]->(m)")
    g.write(
      s"MATCH (u:User{UserID:$u}) WITH u " +
      s"MATCH (m:Movie{MovieID:${ms(1)}}) WITH u, m " +
      "MERGE (u)-[:Recommend{Score:0.5}]->(m)")
    // idempotent on the identical pattern
    g.write(
      s"MATCH (u:User{UserID:$u}) WITH u " +
      s"MATCH (m:Movie{MovieID:${ms(1)}}) WITH u, m " +
      "MERGE (u)-[:Recommend{Score:0.5}]->(m)")
    val got = g.read(s"MATCH (u:User{UserID:$u})-[r:Recommend]->(m:Movie) " +
      "RETURN m.MovieID AS movie_id, r.Score AS score")
      .as[(Long, Double)].collect().toSet
    assert(got == Set((ms(0), 0.75), (ms(1), 0.5)))
    // MERGE matches the WHOLE pattern: same endpoints + different Score
    // creates a SECOND edge (why streaming_rec.py:119's commented DELETE
    // exists)
    g.write(
      s"MATCH (u:User{UserID:$u}) WITH u " +
      s"MATCH (m:Movie{MovieID:${ms(1)}}) WITH u, m " +
      "MERGE (u)-[:Recommend{Score:0.99}]->(m)")
    val twice = g.read(s"MATCH (u:User{UserID:$u})-[r:Recommend]->(m:Movie) " +
      "RETURN m.MovieID AS movie_id, r.Score AS score")
      .as[(Long, Double)].collect().toSet
    assert(twice == Set((ms(0), 0.75), (ms(1), 0.5), (ms(1), 0.99)))
  }

  test("movie-feature write→read round trip (train_topn.py:162-166 literal " +
      "casing/spacing → streaming_rec.py:156-159), unwritten props null") {
    val g = freshGraph
    val ms = ratings.select($"item_id").distinct()
      .orderBy($"item_id").as[Long].take(3)
    ms.zipWithIndex.foreach { case (m, i) =>
      val feature = Seq.fill(4)(s"0.$i").mkString(",")
      // literal `Match …  SET m.Features='…';` — lowercase keyword, no
      // spaces around `=`, exactly as train_topn.py emits it
      g.write(s"Match (m:Movie{MovieID:$m}) SET m.Features='$feature';")
    }
    val got = g.read("MATCH (m:Movie) " +
      "RETURN m.MovieID AS movie_id, m.Features AS features")
      .as[(Long, Option[String])].collect().toMap
    ms.zipWithIndex.foreach { case (m, i) =>
      assert(got(m).contains(Seq.fill(4)(s"0.$i").mkString(",")))
    }
    assert(got.view.filterKeys(!ms.contains(_)).values.forall(_.isEmpty),
      "movies never written must read a null Features")
    // Genres were never loaded into this store: the get_movie_genres read
    // (streaming_rec.py:140-143) runs and returns nulls
    val genres = g.read("MATCH (m:Movie) " +
      "RETURN m.MovieID AS movie_id, m.Genres AS genres")
    assert(genres.select($"genres").collect().forall(_.isNullAt(0)))
  }

  test("report console queries: path binding + LIMIT (doc/课程报告.md:559)") {
    val g = freshGraph
    val n = ratings.count()
    val df = g.read("MATCH p=()-[Rate]->() RETURN p LIMIT 300;")
    assert(df.columns.toSeq == Seq("p.src", "p.dst", "p.type", "p.Rating"))
    val rows = df.as[(Long, Long, String, Double)].collect()
    assert(rows.length == math.min(300L, n).toInt)
    val all = ratings.select($"user_id", $"item_id", $"rating")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows.forall { case (s2, d2, t, r) =>
      t == "Rate" && all.contains((s2, d2, r))
    })
    // the engine's documented LIMIT-without-ORDER-BY semantics (q130):
    // the sample is the first n rows in rendered-column lexicographic
    // order = (src, dst) insertion order — deterministic, not arbitrary
    val want = ratings.select($"user_id", $"item_id", $"rating")
      .orderBy($"user_id", $"item_id").limit(300)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.sortBy(r => (r._1, r._2))
      .map(r => (r._1, r._2, r._4)).toSeq == want)
  }

  test("report console queries: whole-variable RETURN u, r, m renders " +
      "node/edge properties (doc/课程报告.md:567,575,583)") {
    val g = freshGraph
    val u = ratings.select($"user_id").orderBy($"user_id").as[Long].head()
    val df = g.read(
      s"MATCH (u:User{UserID:$u})-[r:Rate]->(m:Movie) RETURN u, r, m;")
    assert(df.columns.toSeq ==
      Seq("u.UserID", "r.type", "r.Rating", "m.MovieID", "m.Title"))
    val got = df.select($"`u.UserID`", $"`m.MovieID`", $"`r.Rating`")
      .as[(Long, Long, Double)].collect().toSet
    val want = ratings.where($"user_id" === u)
      .select($"user_id", $"item_id", $"rating")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
    // single-node form with lowercase `return` (doc/课程报告.md:583)
    val m0 = ratings.select($"item_id").orderBy($"item_id").as[Long].head()
    val mdf = g.read(s"MATCH (m:Movie{MovieID:$m0}) return m;")
    assert(mdf.columns.toSeq == Seq("m.MovieID", "m.Title"))
    assert(mdf.select($"`m.MovieID`").as[Long].collect().toSeq == Seq(m0))
    assert(!mdf.select($"`m.Title`").collect()(0).isNullAt(0))
  }

  test("report console queries: title-filtered rating lookup " +
      "(doc/课程报告.md:591)") {
    val g = freshGraph
    val (u, m0, rating) = ratings
      .select($"user_id", $"item_id", $"rating")
      .orderBy($"user_id", $"item_id")
      .as[(Long, Long, Double)].head()
    val title = graft.Tables.part(spark, sfDir)
      .where($"p_partkey" === m0).select($"p_name").as[String].head()
    val df = g.read(s"MATCH (:User{UserID:$u})-[r:Rate]->" +
      s"(:Movie{Title:'$title'}) RETURN r;")
    assert(df.columns.toSeq == Seq("r.type", "r.Rating"))
    assert(df.as[(String, Double)].collect().toSeq == Seq(("Rate", rating)))
  }

  test("report console queries: dataset statistics COUNT/AVG " +
      "(doc/课程报告.md:604-637)") {
    val g = freshGraph
    val nu = g.read("MATCH (u:User) RETURN COUNT(u);")
    assert(nu.columns.toSeq == Seq("COUNT(u)"))
    assert(nu.first().getLong(0) ==
      ratings.select($"user_id").distinct().count())
    val nm = g.read("MATCH (m:Movie) RETURN COUNT(m);")
    assert(nm.first().getLong(0) ==
      ratings.select($"item_id").distinct().count())
    val nr = g.read("MATCH (User)-[r:Rate]->(Movie) RETURN COUNT(r);")
    assert(nr.columns.toSeq == Seq("COUNT(r)"))
    assert(nr.first().getLong(0) == ratings.count())
    val av = g.read("MATCH (User)-[r:Rate]->(Movie) RETURN AVG(r.Rating);")
    assert(av.columns.toSeq == Seq("AVG(r.Rating)"))
    val want = ratings.agg(avg($"rating")).first().getDouble(0)
    assert(math.abs(av.first().getDouble(0) - want) < 1e-9)
  }

  test("DELETE clears a user's Recommend edges and only theirs " +
      "(streaming_rec.py:119)") {
    val g = freshGraph
    val us = ratings.select($"user_id").distinct()
      .orderBy($"user_id").as[Long].take(2)
    val m0 = ratings.select($"item_id").orderBy($"item_id").as[Long].head()
    us.foreach { u =>
      g.write(
        s"MATCH (u:User{UserID:$u}) WITH u " +
        s"MATCH (m:Movie{MovieID:$m0}) WITH u, m " +
        "MERGE (u)-[:Recommend{Score:0.8}]->(m)")
    }
    g.write(s"MATCH (:User{UserID:${us(0)}})-[r:Recommend]->() DELETE r;")
    val left = g.read("MATCH (u:User)-[r:Recommend]->(m:Movie) " +
      "RETURN u.UserID AS user_id, m.MovieID AS movie_id")
      .as[(Long, Long)].collect().toSet
    assert(left == Set((us(1), m0)))
  }

  test("string literals containing keywords parse as data, spacing intact " +
      "(ADVICE r10: the clause scanner must not split inside quotes)") {
    val g = freshGraph
    val anyUser = ratings.select($"user_id").orderBy($"user_id").as[Long].head()
    // SET value holding clause keywords and a double space
    g.write(s"MATCH (u:User{UserID:$anyUser}) SET u.Note = 'set  limit 5 match'")
    val got = g.read(s"MATCH (u:User{UserID:$anyUser}) " +
      "RETURN u.UserID AS user_id, u.Note AS note")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((anyUser, "set  limit 5 match")))
    // a Title VALUE containing a keyword word filters quietly (no match)
    assert(g.read("MATCH (m:Movie{Title:'The Match'}) " +
      "RETURN m.MovieID AS movie_id").count() == 0L)
  }

  test("inline edge properties in MATCH filter the relationship " +
      "(ADVICE r10: parsed-but-unapplied would silently return all rows)") {
    val users = Seq(1L, 2L).toDF("UserID")
    val movies = Seq(10L, 20L).toDF("MovieID")
    val rate = Seq((1L, 10L, 5.0), (1L, 20L, 3.0), (2L, 10L, 5.0))
      .toDF("__src", "__dst", "Rating")
    val g = new CypherGraph(spark,
      Map("User" -> ("UserID", users), "Movie" -> ("MovieID", movies)),
      Map("Rate" -> ("User", "Movie", rate)))
    val got = g.read("MATCH (u:User)-[r:Rate{Rating:5}]->(m:Movie) " +
      "RETURN u.UserID AS user_id, m.MovieID AS movie_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L)))
    // a property no relationship type carries matches nothing (null ≠ v)
    assert(g.read("MATCH (u:User)-[r:Rate{Weight:1}]->(m:Movie) " +
      "RETURN u.UserID AS user_id").count() == 0L)
  }

  test("unsupported constructs fail with the named exception citing the " +
      "migration rewrite table (VERDICT r10 item 6)") {
    val g = freshGraph
    val qs = Seq(
      "OPTIONAL MATCH (u:User) RETURN u.UserID",
      "MATCH (u:User)-[r:Rate*1..3]->(m:Movie) RETURN u.UserID",
      "MATCH (u:User)-[r:Rate]->(m:Movie) RETURN u.UserID, collect(m.MovieID)",
      "UNWIND x AS y RETURN y",
      "CREATE (u:User) RETURN u.UserID",
      "MATCH (u:User) CALL apoc.do() RETURN u.UserID")
    qs.foreach { q =>
      val e = intercept[UnsupportedCypherException](g.read(q))
      assert(e.getMessage.contains("MIGRATION.md"), s"for: $q\n${e.getMessage}")
    }
    // but the keyword INSIDE a literal does not trip the detector
    assert(g.read("MATCH (m:Movie{Title:'create union unwind'}) " +
      "RETURN m.MovieID AS movie_id").count() == 0L)
  }

  test("reserved-looking IDENTIFIERS do not trip the unsupported " +
      "detectors (ADVICE r11: clause-position anchoring)") {
    val g = freshGraph
    // alias spelled like a clause keyword
    assert(g.read("MATCH (u:User) RETURN u.UserID AS call").count() > 0L)
    assert(g.read("MATCH (u:User) RETURN u.UserID AS union").count() > 0L)
    // pattern variable + property reads spelled like clause keywords
    assert(g.read("MATCH (create:User) RETURN create.UserID AS user_id")
      .count() > 0L)
    assert(g.read("MATCH (u:User) RETURN u.unwind AS v").count() > 0L)
    // while the same words in CLAUSE position still fail by name
    intercept[UnsupportedCypherException](
      g.read("MATCH (u:User) RETURN u.UserID AS x UNION MATCH (v:User) " +
        "RETURN v.UserID AS x"))
    intercept[UnsupportedCypherException](
      g.read("CALL db.labels() RETURN x"))
  }

  test("repeated SET writes keep the store's lineage flat and visible " +
      "(ADVICE r10: per-write cache stacking grew state and lineage)") {
    val g = freshGraph
    val anyUser = ratings.select($"user_id").orderBy($"user_id").as[Long].head()
    def readBack = g.read(s"MATCH (u:User{UserID:$anyUser}) " +
      "RETURN u.UserID AS user_id, u.Interest AS interest")
    def planNodes: Int =
      readBack.queryExecution.optimizedPlan.treeString.count(_ == '\n')
    g.write("MATCH (u:User) SET u.Interest = 'v1'")
    g.write(s"MATCH (u:User{UserID:$anyUser}) SET u.Interest = 'v2'")
    val after2 = planNodes
    val persistedAfter2 = spark.sparkContext.getPersistentRDDs.size
    // the reference's streaming loop issues one SET per user per batch
    // (streaming_rec.py:101-104) — drive a long-lived-driver volume of
    // writes. 48 is enough: a leak here is LINEAR (one stacked cache
    // entry / plan level per write), so 46 extra entries clears the +12
    // bound by 4× — the same signal 120 gave at a third of the
    // wall-clock (ADVICE r12: each write costs a re-root + checkpoint
    // job, and the polling loop below bounds a worst case on top).
    val writes = 48
    (3 to writes).foreach(i =>
      g.write(s"MATCH (u:User{UserID:$anyUser}) SET u.Interest = 'v$i'"))
    // the read plan over the store has the same node count after 48
    // writes as after 2 — each write re-rooted the table at a leaf
    assert(planNodes == after2)
    assert(readBack.as[(Long, String)].collect().toSeq ==
      Seq((anyUser, s"v$writes")))
    // ...and the persisted-block population is bounded too: each swapIn
    // unpersists the prior table and the ContextCleaner reclaims old
    // checkpoint RDDs once unreferenced. The cleaner is async and
    // GC-driven, so nudge it and poll rather than asserting instantly.
    // The bound is loose enough to never flake on cleaner timing.
    val bound = persistedAfter2 + 12
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def persisted = spark.sparkContext.getPersistentRDDs.size
    while (persisted > bound && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(250)
    }
    assert(persisted <= bound,
      s"$persisted persisted RDDs after $writes writes (baseline " +
        s"$persistedAfter2 after 2): the write path is stacking state")
  }
}
