package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tokenize.CodeTokenizer._

class TokenizerSpec extends AnyFunSuite {

  test("simpleTokens: lowercase, split non-alnum") {
    assert(simpleTokens("Hello, World-42!").toSeq == Seq("hello", "world", "42"))
    assert(simpleTokens("").isEmpty)
    assert(simpleTokens("...").isEmpty)
  }

  test("codeTokens: camelCase boundaries") {
    assert(codeTokens("parseHttpRequest").toSeq == Seq("parse", "http", "request"))
    assert(codeTokens("fooBarBaz").toSeq == Seq("foo", "bar", "baz"))
  }

  test("codeTokens: acronym runs HTTPServer -> http server") {
    assert(codeTokens("HTTPServer").toSeq == Seq("http", "server"))
    assert(codeTokens("parseHTTPRequest2").toSeq == Seq("parse", "http", "request2"))
  }

  test("codeTokens: snake_case and SCREAMING_SNAKE") {
    assert(codeTokens("foo_bar_baz").toSeq == Seq("foo", "bar", "baz"))
    assert(codeTokens("MAX_VALUE").toSeq == Seq("max", "value"))
    assert(codeTokens("_leading__double_").toSeq == Seq("leading", "double"))
  }

  test("codeTokens: mixed source line") {
    assert(codeTokens("def getValueIndex(data_key: Map[String, Int])").toSeq ==
      Seq("def", "get", "value", "index", "data", "key", "map", "string", "int"))
  }

  test("codeTokens: digits stay attached") {
    assert(codeTokens("utf8String v2Parser").toSeq == Seq("utf8", "string", "v2", "parser"))
  }

  test("simple and code agree on already-simple text") {
    val s = "the quick brown fox 42 jumps"
    assert(simpleTokens(s).toSeq == codeTokens(s).toSeq)
  }
}
