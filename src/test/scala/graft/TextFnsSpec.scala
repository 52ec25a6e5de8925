package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** Port of the reference's pure-function tests
  * (/root/reference/src/db/sanitize.test.ts:4-47) plus property-style
  * invariants (SURVEY.md §5.2) over generated inputs. Runs the COLUMN
  * pipeline through a real Spark plan so the tested code is the shipped code.
  */
class TextFnsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sanitizeViaSpark(inputs: Seq[String]): Seq[String] =
    inputs.toDF("s").select(TextFns.sanitizeInput(col("s"))).as[String].collect().toSeq

  private def sanitize1(s: String): String = sanitizeViaSpark(Seq(s)).head

  // sanitize.test.ts:4-47 — the nine pinned cases
  test("sanitize: normal text passes through") {
    assert(sanitize1("hello world") == "hello world")
  }
  test("sanitize: newlines and tabs preserved") {
    assert(sanitize1("line1\nline2\tend") == "line1\nline2\tend")
  }
  test("sanitize: null byte stripped (client.test.ts:106-128)") {
    assert(sanitize1("hello\u0000world") == "helloworld")
    assert(sanitize1("test\u0000name") == "testname")
  }
  test("sanitize: bell and backspace stripped") {
    assert(sanitize1("a\u0007b\u0008c") == "abc")
  }
  test("sanitize: 3+ newlines collapse to two") {
    assert(sanitize1("a\n\n\n\nb") == "a\n\nb")
    assert(sanitize1("a\n\n\n\n\n\nb") == "a\n\nb")
  }
  test("sanitize: trims surrounding whitespace") {
    assert(sanitize1("  hello  ") == "hello")
  }
  // JS .trim() parity beyond sanitize.test.ts's ASCII cases: ECMAScript
  // WhiteSpace includes NBSP, Zs spaces, ZWNBSP/BOM, and the U+2028/2029
  // line separators — Java's bare \s strips none of these.
  test("sanitize: trims Unicode whitespace like JS .trim() (NBSP/BOM/Zs)") {
    assert(sanitize1(" hello ") == "hello")       // NBSP
    assert(sanitize1("﻿hello﻿") == "hello")       // BOM / ZWNBSP
    assert(sanitize1("　hello　") == "hello")       // ideographic space
    assert(sanitize1("  hello ") == "hello") // en/em/thin space
    assert(sanitize1(" hello ") == "hello")       // LS / PS
    assert(sanitize1("  \t hello 　") == "hello")  // mixed run
    // interior Unicode whitespace is NOT stripped (trim is ends-only)
    assert(sanitize1("a b") == "a b")
  }
  test("sanitize: empty string stays empty") {
    assert(sanitize1("") == "")
  }
  test("sanitize: all-control input becomes empty") {
    assert(sanitize1("\u0001\u0002\u0003") == "")
  }
  test("sanitize: unicode text preserved") {
    assert(sanitize1("hello 世界 🌍") == "hello 世界 🌍")
  }

  test("scala twin agrees with the column pipeline") {
    val cases = Seq("hello world", "a\u0000b", "x\n\n\n\ny", "  pad  ",
      "", "mixed\t \n\n\n\nz\u0007  ",
      "\u00A0nbsp\u00A0", "\uFEFFbom\uFEFF", "\u3000wide\u3000")
    assert(cases.map(TextFns.sanitizeInputScala) == sanitizeViaSpark(cases))
  }

  test("truncate: 300 a's -> 256 (client.test.ts:130-141)") {
    val out = Seq("a" * 300).toDF("s")
      .select(TextFns.cleanName(col("s"))).as[String].head()
    assert(out == "a" * 256)
  }
  test("truncate: 5000 x's -> 4096 (client.test.ts:143-154)") {
    val out = Seq("x" * 5000).toDF("s")
      .select(TextFns.cleanObservation(col("s"))).as[String].head()
    assert(out.length == 4096)
  }

  test("likePattern: runs of whitespace/_/- become %") {
    assert(TextFns.likePattern("foo bar") == "%foo%bar%")
    assert(TextFns.likePattern("a_b-c") == "%a%b%c%")
    assert(TextFns.likePattern("a  \t b") == "%a%b%")
    assert(TextFns.likePattern("plain") == "%plain%")
  }

  test("ciLike is locale-independent (Turkish-I regression)") {
    // Under a tr-TR default locale, "I".toLowerCase is dotless "ı" —
    // if ciLike used the default locale, '%INDIA%' would stop matching
    // what Spark's locale-independent lower() produces. Force the locale
    // for the duration of the plan build (the lowercase happens eagerly
    // at Column-construction time).
    val saved = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      val hit = Seq("Entity from india").toDF("s")
        .select(TextFns.ciLike(col("s"), "%INDIA%")).as[Boolean].head()
      assert(hit, "ciLike must lowercase the pattern with Locale.ROOT")
    } finally java.util.Locale.setDefault(saved)
  }

  test("clampLimit: default 10, cap 50 (client.ts:214,244)") {
    assert(TextFns.clampLimit(0) == 10)
    assert(TextFns.clampLimit(-3) == 10)
    assert(TextFns.clampLimit(7) == 7)
    assert(TextFns.clampLimit(50) == 50)
    assert(TextFns.clampLimit(999) == 50)
  }

  // ── generated-input invariants (SURVEY §5.2) ──────────────────────────

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    // whole codepoints only - indexing a String would split the emoji into
    // lone surrogates, which are invalid UTF-8 rather than realistic input
    val alphabet = Seq("a", "b", "c", "X", "Y", "Z", "0", "1", "9", " ",
      "\n", "\t", "\u0000", "\u0007", "\u0008", "\u4e00", "\u4e8c", "\ud83c\udf0d")
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }
  }

  test("property: sanitize is idempotent") {
    val once = randomStrings(200).map(TextFns.sanitizeInputScala)
    assert(once.map(TextFns.sanitizeInputScala) == once)
  }

  test("property: sanitized output has no stripped control chars, no 3+ newlines") {
    randomStrings(200).map(TextFns.sanitizeInputScala).foreach { s =>
      assert(!s.exists(c => c != '\n' && c != '\t' && Character.isISOControl(c)))
      assert(!s.contains("\n\n\n"))
    }
  }

  test("property: spark and scala sanitize agree on generated inputs") {
    val xs = randomStrings(200)
    assert(sanitizeViaSpark(xs) == xs.map(TextFns.sanitizeInputScala))
  }
}
