package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.StringOps

/** Unit + property coverage for the P-family scalar ops (SURVEY §5.2-5.3).
  * Properties drive ScalaCheck generators directly (the scalatestplus
  * bridge isn't among the pinned deps); one Spark job evaluates all
  * samples of a property at once.
  */
class StringOpsSpec extends SparkTestBase {

  /** Deterministic sample batch from a generator. */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(check: A => Unit): Unit =
    samples(g).foreach(check)

  private def eval1(c: org.apache.spark.sql.Column, input: String): String = {
    import spark.implicits._
    Seq(input).toDF("s").select(c).collect().head.getString(0)
  }

  test("P5 bracket removal: nested/empty/multiple brackets") {
    def rm(s: String) = eval1(StringOps.removeBrackets(col("s")), s)
    assert(rm("a [1] b [cite, 2] c") == "a  b  c")
    assert(rm("no brackets") == "no brackets")
    assert(rm("[]x[]") == "x")
    assert(rm("[[inner] left") == " left")   // non-greedy: eats "[[inner]"
  }

  test("P7 simplify: lowercase + strip all punctuation/whitespace") {
    def simp(s: String) = eval1(StringOps.simplify(col("s")), s)
    assert(simp("As pi-RIN.") == "aspirin")
    assert(simp("N-acetyl cysteine!") == "nacetylcysteine")
    assert(simp("") == "")
  }

  test("P8 capitalize prefix keeps suffix verbatim") {
    def cap(s: String) = eval1(StringOps.capitalizePrefix(col("s")), s)
    assert(cap("chebi:15365") == "CHEBI:15365")
    assert(cap("UniProtKB:P45059abc") == "UNIPROTKB:P45059abc")
    assert(cap("mesh:D001241:extra") == "MESH:D001241:extra")
  }

  test("P4 long-token drop keeps short tokens and order") {
    def dlt(s: String) = eval1(StringOps.dropLongTokens(col("s"), 6), s)
    assert(dlt("ab abcde abcdef gh") == "ab abcde gh")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', '-', ':')))
      .map(_.mkString)

  test("property: simplify is idempotent") {
    import spark.implicits._
    val rows = samples(asciiText).toDF("s")
      .select(StringOps.simplify(col("s")).as("a"))
      .select(StringOps.simplify(col("a")).as("b"), col("a"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("property: capitalizePrefix preserves everything after first colon") {
    forAll(asciiText.map(s => s + ":" + s)) { s =>
      val out = eval1(StringOps.capitalizePrefix(col("s")), s)
      assert(out.substring(s.indexOf(':')) == s.substring(s.indexOf(':')))
      assert(out.equalsIgnoreCase(s))
    }
  }

  test("property: dropLongTokens output never contains an over-limit token") {
    forAll(asciiText) { s =>
      val out = eval1(StringOps.dropLongTokens(col("s"), 8), s)
      assert(out.split(" ").filter(_.nonEmpty).forall(_.length < 8))
    }
  }

  test("parsePyList: single-quoted lists, nan sentinel, empty, null " +
       "(node_synonymizer.py:172, 315-318)") {
    import spark.implicits._
    val rows = Seq(
      ("a", "['CHEBI:15365', 'DRUGBANK:DB00945']"),
      ("b", "['solo']"),
      ("c", "[]"),
      ("d", "nan"),
      ("e", ""),
      ("f", null),
      ("g", "not a list at all")).toDF("k", "raw")
      .select(col("k"), StringOps.parsePyList(col("raw")).as("parsed"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.get(1)).map(_ => r.getSeq[String](1)))
      .toMap
    assert(rows("a").contains(Seq("CHEBI:15365", "DRUGBANK:DB00945")))
    assert(rows("b").contains(Seq("solo")))
    assert(rows("c").contains(Seq()))
    assert(rows("d").contains(Seq()))  // "nan" sentinel → empty
    assert(rows("e").contains(Seq()))
    assert(rows("f").contains(Seq()))
    assert(rows("g").isEmpty)          // malformed → null, not a crash
  }

  test("property: parsePyList round-trips python-repr lists of " +
       "quote-free tokens") {
    import spark.implicits._
    val token: Gen[String] = Gen.nonEmptyListOf(
        Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(':', '.', '-', '_')))
      .map(_.mkString)
    val pyList: Gen[List[String]] = Gen.listOf(token)
    forAll(pyList) { xs =>
      val repr =
        if (xs.isEmpty) "nan"
        else xs.map(x => s"'$x'").mkString("[", ", ", "]")
      val parsed = Seq(repr).toDF("raw")
        .select(StringOps.parsePyList(col("raw")).as("p"))
        .collect().head.getSeq[String](0)
      assert(parsed == xs)
    }
  }
}
