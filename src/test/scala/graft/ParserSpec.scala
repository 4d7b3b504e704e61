package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ast._
import graft.parser.{ParseException, Parser, Tokenizer}

/** Tokenizer + parser golden tests (reference test layer 1,
  * tests/test__parser__{tokenizer,parse}.py). */
class ParserSpec extends AnyFunSuite {

  private def tokens(s: String): Seq[String] =
    Tokenizer.tokenize(s).map(_.value)

  test("tokenizer splits operators and strips comments") {
    assert(tokens("select 1+2 -- comment\n, 'it''s'") ==
      Seq("select", "1", "+", "2", ",", "it's"))
    assert(tokens("a.b >= 1e-3 :: json") == Seq("a", ".", "b", ">=", "1e-3", "::", "json"))
    assert(tokens("\"Quoted Id\"") == Seq("Quoted Id"))
  }

  test("identifier case preserved, keywords matched case-insensitively") {
    val s = Parser.parseQuery("SELECT FooBar FROM MyTable")
    assert(s.items == Seq(ExprItem(ColRef(Seq("FooBar")), None)))
    assert(s.from == Seq(TableRef(None, "MyTable", None)))
  }

  test("select AST golden") {
    val s = Parser.parseQuery(
      "select c1 as a, sum(c2) from test where c1 = 0 group by c1 order by a desc limit 3 offset 1")
    assert(s.items == Seq(
      ExprItem(ColRef(Seq("c1")), Some("a")),
      ExprItem(CallSet("sum", Seq(ColRef(Seq("c2")))), None)))
    assert(s.where.contains(BinaryOp("=", ColRef(Seq("c1")), IntLit(0))))
    assert(s.groupBy == Seq(ColRef(Seq("c1"))))
    assert(s.orderBy == Seq(SortItem(ColRef(Seq("a")), asc = false)))
    assert(s.limit.contains(3L) && s.offset.contains(1L))
  }

  test("operator precedence shape: ^ binds tighter than *, || between * and +") {
    // 2 * 3 ^ 2 → 2 * (3 ^ 2)
    assert(Parser.parseExpression("2 * 3 ^ 2") ==
      BinaryOp("*", IntLit(2), BinaryOp("^", IntLit(3), IntLit(2))))
    // a + b || c → a + (b || c)
    assert(Parser.parseExpression("a + b || c") ==
      BinaryOp("+", ColRef(Seq("a")),
        BinaryOp("||", ColRef(Seq("b")), ColRef(Seq("c")))))
    // not a = b → not (a = b)
    assert(Parser.parseExpression("not a = b") ==
      UnaryOp("not", BinaryOp("=", ColRef(Seq("a")), ColRef(Seq("b")))))
  }

  test("join chain builds left-deep tree") {
    val s = Parser.parseQuery("select * from a join b on x = y left join c on p = q")
    val JoinRel("left", JoinRel("inner", TableRef(_, "a", _), TableRef(_, "b", _), _),
      TableRef(_, "c", _), _) = s.from.head
  }

  test("simple case desugars to searched case") {
    val e = Parser.parseExpression("case x when 1 then 'a' else 'b' end")
    assert(e == CaseExpr(
      Seq(BinaryOp("=", ColRef(Seq("x")), IntLit(1)) -> StringLit("a")),
      Some(StringLit("b"))))
  }

  test("trim/position special forms") {
    assert(Parser.parseExpression("trim(both 'xy' from s)") ==
      Call("trim_both", Seq(StringLit("xy"), ColRef(Seq("s")))))
    assert(Parser.parseExpression("position('a' in s)") ==
      Call("position", Seq(StringLit("a"), ColRef(Seq("s")))))
  }

  test("window call with frame") {
    val e = Parser.parseExpression(
      "sum(x) over (partition by k order by t rows between 1 preceding and current row)")
    val CallAnalytics(CallSet("sum", _, _, _), Seq(ColRef(Seq("k"))),
      Seq(SortItem(ColRef(Seq("t")), true, None)), Some(f)) = e
    assert(f == FrameSpec("rows", Some(-1L), Some(0L)))
  }

  test("copy statements") {
    assert(Parser.parse("COPY foo FROM 'x.csv' WITH delimiter ';', format 'csv'") ==
      CopyFrom("foo", "x.csv", Map("delimiter" -> ";", "format" -> "csv")))
    assert(Parser.parse("COPY foo TO 'y.csv' WITH format 'csv'") ==
      CopyTo("foo", "y.csv", Map("format" -> "csv")))
    assert(Parser.parse("DROP TABLE a, b") == DropTable(Seq("a", "b")))
    val CreateTableAs("t", _, opts0) = Parser.parse("CREATE TABLE t AS select 1")
    assert(opts0 == Map.empty)
    // persisted-catalog options: parenthesized with '=', and the COPY
    // bare style, parse to the same map
    val CreateTableAs("p", _, opts1) = Parser.parse(
      "CREATE TABLE p WITH (persist='parquet', path='out_dir') AS select 1")
    assert(opts1 == Map("persist" -> "parquet", "path" -> "out_dir"))
    val CreateTableAs("p2", _, opts2) = Parser.parse(
      "CREATE TABLE p2 WITH persist 'parquet' AS select 1")
    assert(opts2 == Map("persist" -> "parquet"))
  }

  test("float literal formats") {
    assert(Parser.parseExpression("1.5e-2") == FloatLit(0.015))
    assert(Parser.parseExpression("1e3") == FloatLit(1000.0))
    assert(Parser.parseExpression("2.5") == FloatLit(2.5))
    assert(Parser.parseExpression(".5") == FloatLit(0.5))
  }

  test("parse errors carry context") {
    val e = intercept[ParseException] { Parser.parse("select from where") }
    assert(e.getMessage.contains("near"))
    intercept[ParseException] { Parser.parse("select 1 extra garbage ,,") }
  }

  test("distinct on parses") {
    val s = Parser.parseQuery("select distinct on (k) k, v from t order by k, v")
    assert(s.distinctOn == Seq(ColRef(Seq("k"))))
    assert(!s.distinct)
  }
}
