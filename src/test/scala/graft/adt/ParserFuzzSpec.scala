package graft.adt

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz hardening for both query front-ends: ANY input must either
  * parse or throw the typed AdtParseException — never a
  * NullPointerException, StackOverflowError, match error, or hang. A
  * service front-end maps AdtParseException to HTTP 400; anything else
  * would surface as a 500 and a stack trace in the log. */
class ParserFuzzSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** Token soup biased toward query-language material so the fuzz
    * reaches deep parser states, not just the first token check. */
  private val word: Gen[String] = Gen.oneOf(
    "SELECT", "FROM", "DIGITALTWINS", "RELATIONSHIPS", "WHERE", "MATCH",
    "RETURN", "WITH", "UNWIND", "AS", "AND", "OR", "NOT", "IN", "TOP",
    "COUNT", "JOIN", "RELATED", "ORDER", "BY", "LIMIT", "SKIP", "DISTINCT",
    "IS_OF_MODEL", "STARTSWITH", "CONTAINS", "IS", "NULL", "DEFINED",
    "CASE", "WHEN", "THEN", "ELSE", "END", "EXISTS", "reduce", "collect",
    "T", "r", "b", "name", "$dtId", "$metadata", "*", "(", ")", "[", "]",
    "{", "}", ",", ".", "=", "!=", "<", ">", "<=", ">=", "-", "->", "<-",
    "'x'", "'dtmi:g:a;1'", "1", "2.5", "true", "false", ":", "|", "..",
    "`$model`", "#", "@", "\\", "\"unterminated")

  private val soup: Gen[String] =
    Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))

  private def totalParse(parse: String => Any)(q: String): Boolean =
    try { parse(q); true }
    catch {
      case _: AdtParseException => true
      // anything else is the bug this spec exists to catch
    }

  test("ADT parser totality: parse or AdtParseException, nothing else") {
    check(Prop.forAll(soup)(q => totalParse(AdtParser.parse)(q)))
  }

  test("Cypher parser totality: parse or AdtParseException, nothing else") {
    check(Prop.forAll(soup)(q => totalParse(CypherParser.parse)(q)))
  }

  test("language detection is total on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { q =>
      QueryLanguage.detect(q); true
    })
  }

  test("deeply nested parentheses fail cleanly, no stack overflow") {
    val deepAdt = "SELECT T FROM DIGITALTWINS T WHERE " +
      "(" * 5000 + "T.x = 1" + ")" * 5000
    intercept[AdtParseException](AdtParser.parse(deepAdt))
    val deepCypher = "MATCH (t:Twin) WHERE " +
      "(" * 5000 + "t.x = 1" + ")" * 5000 + " RETURN t"
    intercept[AdtParseException](CypherParser.parse(deepCypher))
    // moderate nesting stays legal
    val ok = "SELECT T FROM DIGITALTWINS T WHERE " +
      "(" * 50 + "T.x = 1" + ")" * 50
    AdtParser.parse(ok)
  }
}
