package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Conditions._
import graft.parse.{Conditions, KvList}

class ConditionsSpec extends AnyFunSuite {

  /** Raw ScalaCheck (the scalatestplus bridge isn't in the offline
    * artifact cache).
    */
  private def checkProp(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  test("literal wrappers type the RHS; bare strings stay strings") {
    assert(parseLit("NUMBER(2)") == NLit(2.0))
    assert(parseLit("NUMBER( 3.5 )") == NLit(3.5))
    assert(parseLit("DATE(2021-01-31)") == DLit(LocalDate.of(2021, 1, 31)))
    assert(parseLit("BOOLEAN(True)") == BLit(true))
    assert(parseLit("BOOLEAN(false)") == BLit(false))
    assert(parseLit("C28554") == SLit("C28554"))
    assert(parseLit("2") == SLit("2")) // never helpfully coerced (SURVEY §7.4 #3)
  }

  test("single comparisons, >=/<= before =") {
    assert(Conditions.parse("DSDECOD_STD = C28554") == Cmp("DSDECOD_STD", "=", SLit("C28554")))
    assert(Conditions.parse("SURSTAT_STD = NUMBER(2)") == Cmp("SURSTAT_STD", "=", NLit(2.0)))
    assert(Conditions.parse("x >= NUMBER(1)") == Cmp("x", ">=", NLit(1.0)))
    assert(Conditions.parse("x <= DATE(2020-02-02)") ==
      Cmp("x", "<=", DLit(LocalDate.of(2020, 2, 2))))
  }

  test("NOT NULL spelled as equality") {
    assert(Conditions.parse("EXSTDAT = NOT NULL") == NotNull("EXSTDAT"))
    assert(Conditions.parse("x = not null") == NotNull("x"))
  }

  test("conjunction/disjunction split on first separator, & wins") {
    assert(Conditions.parse("a = 1 & b = 2") ==
      And(Cmp("a", "=", SLit("1")), Cmp("b", "=", SLit("2"))))
    assert(Conditions.parse("a = 1 | b = 2") ==
      Or(Cmp("a", "=", SLit("1")), Cmp("b", "=", SLit("2"))))
    // & dispatch happens before | — mirrors the reference's substring scan
    assert(Conditions.parse("a = 1 & b = 2 | c = 3").isInstanceOf[And])
  }

  test("n-term conjunctions fold right, never absorb into a literal") {
    // the old 2-way split compared b against the literal "2 & c = 3"
    assert(Conditions.parse("a = 1 & b = 2 & c = 3") ==
      And(Cmp("a", "=", SLit("1")),
        And(Cmp("b", "=", SLit("2")), Cmp("c", "=", SLit("3")))))
    assert(Conditions.parse("a = 1 | b = 2 | c = 3") ==
      Or(Cmp("a", "=", SLit("1")),
        Or(Cmp("b", "=", SLit("2")), Cmp("c", "=", SLit("3")))))
  }

  test("BETWEEN is legal on EITHER side of a conjunction/disjunction") {
    // left-of-& was previously order-dependently rejected
    assert(Conditions.parse("a BETWEEN (NUMBER(1), NUMBER(2)) & b = 3") ==
      And(Between("a", NLit(1.0), NLit(2.0)), Cmp("b", "=", SLit("3"))))
    assert(Conditions.parse("b = 3 & a BETWEEN (NUMBER(1), NUMBER(2))") ==
      And(Cmp("b", "=", SLit("3")), Between("a", NLit(1.0), NLit(2.0))))
    assert(Conditions.parse("a BETWEEN (NUMBER(1), NUMBER(2)) | b = 3") ==
      Or(Between("a", NLit(1.0), NLit(2.0)), Cmp("b", "=", SLit("3"))))
  }

  test("malformed typed literals throw ParseError, not raw JDK exceptions") {
    intercept[Conditions.ParseError](Conditions.parse("a = NUMBER(1,5)"))
    intercept[Conditions.ParseError](Conditions.parse("a = DATE(01/02/2020)"))
  }

  test("BETWEEN with typed bounds") {
    assert(Conditions.parse("q BETWEEN (NUMBER(5), NUMBER(10))") ==
      Between("q", NLit(5.0), NLit(10.0)))
    assert(Conditions.parse("d between (DATE(2020-01-01), DATE(2020-12-31))") ==
      Between("d", DLit(LocalDate.of(2020, 1, 1)), DLit(LocalDate.of(2020, 12, 31))))
  }

  test("garbage throws ParseError") {
    assertThrows[ParseError](Conditions.parse(""))
    assertThrows[ParseError](Conditions.parse("no operator here"))
  }

  private val colGen = Gen.identifier.suchThat(s =>
    s.nonEmpty && !s.contains("=") && !s.contains("&") && !s.contains("|"))
  private val numGen = Gen.chooseNum(-1e6, 1e6)

  test("property: col >= NUMBER(n) round-trips for any identifier/number") {
    checkProp(Prop.forAll(colGen, numGen) { (c, n) =>
      Conditions.parse(s"$c >= NUMBER($n)") match {
        case Cmp(cc, ">=", NLit(v)) => cc == c && math.abs(v - n) < 1e-6
        case _ => false
      }
    })
  }

  test("property: whitespace around operators is irrelevant") {
    checkProp(Prop.forAll(colGen, Gen.alphaNumStr.suchThat(_.nonEmpty)) { (c, v) =>
      Conditions.parse(s"  $c   =   $v  ") == Conditions.parse(s"$c=$v")
    })
  }

  test("KvList preserves insertion order (positional grammars rely on it)") {
    val m = KvList.parse("z=1, a=2, m=3", ',')
    assert(m.keys.toSeq == Seq("z", "a", "m"))
  }

  test("KvList.parseLenient folds '='-less segments into prior value") {
    val m = KvList.parseLenient("group_by_cols=a,b, slice_num=2")
    assert(m("group_by_cols") == "a,b")
    assert(m("slice_num") == "2")
    val s = KvList.parseLenient("sort_cols=x,y,z, sort_order=DESC")
    assert(s("sort_cols") == "x,y,z" && s("sort_order") == "DESC")
    // the fold must rejoin with the SEPARATOR THE SPLIT CONSUMED — a
    // hardcoded ',' would corrupt a folded value under the '|' grammar
    val p = KvList.parseLenient("summary_col_ops=a#min | b#max", '|')
    assert(p("summary_col_ops") == "a#min|b#max")
  }

  test("hashPairs parses col#fn lists") {
    assert(KvList.hashPairs("a#min, b#last") == Seq(("a", "min"), ("b", "last")))
    assertThrows[IllegalArgumentException](KvList.hashPairs("a"))
    // the '|' grammar's parseLenient fold rejoins with '|', so the
    // value reaching hashPairs may be '|'-separated — both must parse
    assert(KvList.hashPairs("a#min|b#max") == Seq(("a", "min"), ("b", "max")))
    assert(KvList.hashPairs(
      KvList.parseLenient("summary_col_ops=a#min | b#max", '|')("summary_col_ops")) ==
      Seq(("a", "min"), ("b", "max")))
  }
}
