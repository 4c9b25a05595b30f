package graft.cypher

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAllNoShrink, propBoolean}

import CypherCompat._

/** ScalaCheck properties for the Cypher clause parser (VERDICT r10
  * item 6): the parse must be invariant under whitespace and keyword
  * casing, honor aliases verbatim, and treat quoted literals as data no
  * matter what keywords they contain. Pure parsing — no Spark jobs —
  * so these run the full default case count.
  */
object CypherParserProps extends Properties("graft.cypher.parser") {

  private val kwSet = Set("match", "with", "where", "return", "set",
    "merge", "delete", "order", "by", "limit", "as", "asc", "desc",
    "count", "avg", "sum", "min", "max", "optional", "unwind", "create",
    "union", "call", "collect")

  /** 6-char identifier, never (case-insensitively) a keyword. */
  private val identGen: Gen[String] = (for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString).suchThat(s => !kwSet(s.toLowerCase))

  /** 1–3 whitespace chars (space / tab / newline). */
  private val wsGen: Gen[String] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(' ', '\t', '\n')).map(_.mkString))

  /** The token with each letter's case flipped independently. */
  private def caseVariant(tok: String): Gen[String] =
    Gen.sequence[List[Char], Char](tok.toList.map(c =>
      Gen.oneOf(c.toLower, c.toUpper))).map(_.mkString)

  /** A canonical query exercising the whole supported read grammar, as
    * atomic tokens (ws is inserted BETWEEN tokens; keyword tokens get
    * case-randomized). */
  private val canonicalTokens: Seq[String] = Seq(
    "MATCH", "(u:User)-[r:Rate]->(m:Movie)",
    "WITH", "m", ",", "COUNT", "(r)", "AS", "cnt",
    "WHERE", "cnt", ">", "2",
    "MATCH", "(User)-[r2:Rate]->(m)",
    "RETURN", "m.MovieID", "AS", "movie1", ",", "AVG", "(r2.Rating)",
    "AS", "avg1",
    "ORDER", "BY", "avg1", "DESC", "LIMIT", "20")
  private val keywordToks = Set("MATCH", "WITH", "WHERE", "RETURN",
    "ORDER", "BY", "LIMIT", "AS", "DESC", "COUNT", "AVG")

  private val mangledQuery: Gen[String] = for {
    toks <- Gen.sequence[List[String], String](canonicalTokens.toList.map {
      t => if (keywordToks(t)) caseVariant(t) else Gen.const(t)
    })
    seps <- Gen.listOfN(toks.size, wsGen)
  } yield toks.zip(seps).map { case (t, w) => t + w }.mkString

  private val canonicalParse = parse(canonicalTokens.mkString(" "))

  property("parse is invariant under whitespace and keyword casing") =
    forAllNoShrink(mangledQuery) { q => parse(q) == canonicalParse }

  property("RETURN aliases are honored verbatim") =
    forAllNoShrink(identGen, identGen) { (a, b) =>
      (a != b) ==> {
        parse("MATCH (u:User)-[r:Rate]->(m:Movie) " +
          s"RETURN u.UserID AS $a, COUNT(r) AS $b") match {
          case Seq(MatchC(_), ReturnC(items, None, None)) =>
            items.map(_.alias) == Seq(a, b)
          case _ => false
        }
      }
    }

  /** Nasty literal values: clause keywords, detector keywords, doubled
    * spaces — none may split a clause or trip the unsupported scan. */
  private val nastyLit: Gen[String] = for {
    core <- Gen.oneOf("limit 5", "The  Match", "RETURN x", "order by y",
      "set u.X", "create union unwind", "collect( merge")
    pre <- Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString)
  } yield s"$pre $core"

  property("quoted literals are data: keywords inside values never split " +
      "clauses or trip the unsupported-construct scan") =
    forAllNoShrink(nastyLit) { v =>
      parse(s"MATCH (m:Movie{Title:'$v'}) RETURN m.MovieID AS movie1") match {
        case Seq(MatchC(p), ReturnC(_, None, None)) =>
          p.src.props.get("Title").contains(v)
        case _ => false
      }
    }

  property("inline edge properties parse into the edge pattern") =
    forAllNoShrink(Gen.choose(1L, 5L)) { n =>
      parse(s"MATCH (u:User)-[r:Rate{Rating:$n}]->(m:Movie) " +
        "RETURN u.UserID AS uid1") match {
        case Seq(MatchC(Pattern(_, Some(e), _, _)), ReturnC(_, _, _)) =>
          e.props == Map("Rating" -> n)
        case _ => false
      }
    }

  property("unsupported constructs throw the named exception, with the " +
      "migration pointer, at any casing") =
    forAllNoShrink(Gen.oneOf("OPTIONAL MATCH", "optional match",
      "Optional Match"), identGen) { (om, v) =>
      try { parse(s"$om (u:User) RETURN u.$v"); false }
      catch {
        case e: UnsupportedCypherException => e.getMessage.contains("MIGRATION.md")
      }
    }
}
