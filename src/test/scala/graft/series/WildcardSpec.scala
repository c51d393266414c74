package graft.series

import org.scalatest.funsuite.AnyFunSuite

/** Wildcard planner corner cases (reference `src/wildcard.rs:41-83` and the
  * shapes exercised by the 80-case delete matrix, `src/tests.rs:1262-1302`).
  */
class WildcardSpec extends AnyFunSuite {
  test("exact pattern (no %)") {
    val w = Wildcard("fib")
    assert(w.isExact && w.prefix == "fib" && !w.isPrefixOnly)
  }

  test("prefix-only pattern needs no residual LIKE") {
    val w = Wildcard("fib%")
    assert(!w.isExact && w.isPrefixOnly && w.prefix == "fib")
  }

  test("match-all pattern") {
    val w = Wildcard("%")
    assert(w.matchesAll && w.prefix.isEmpty && w.isPrefixOnly)
  }

  test("infix patterns keep prefix and need LIKE") {
    assert(Wildcard("a%a").prefix == "a" && !Wildcard("a%a").isPrefixOnly)
    assert(Wildcard("%a%").prefix == "" && !Wildcard("%a%").isPrefixOnly)
    assert(Wildcard("%a").prefix == "")
  }

  test("underscore and backslash are literal (only % is magic)") {
    assert(Wildcard("a_b%").likePattern == "a\\_b%")
    assert(Wildcard("a\\b%").likePattern == "a\\\\b%")
  }

  test("prefix successor increments last byte") {
    assert(Wildcard.asciiSuccessor("fib").contains("fic"))
    assert(Wildcard.asciiSuccessor("az").contains("a{")) // 'z'+1
    assert(Wildcard.asciiSuccessor("").isEmpty)
    assert(Wildcard.prefixSuccessor("fib").contains("fic"))
    assert(Wildcard.prefixSuccessor("").isEmpty)
  }

  test("prefix successor drops trailing 0xFF bytes") {
    val s = "a" + "ÿ"
    assert(Wildcard.prefixSuccessor(s).contains("b") ||
      Wildcard.prefixSuccessor(s).exists(_.startsWith("a")))
  }
}
