package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.Robots.Rule

/** RFC 9309 semantics: group selection, longest-match with Allow-wins
  * ties, wildcard/anchor patterns, parser edge cases, and the kernel's
  * equivalence to the driver evaluator.
  */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rfcExample =
    """# comment line
      |User-agent: examplebot
      |Disallow: /foo
      |Allow: /foo/bar$
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("group selection: dedicated group beats *, prefix token match, * fallback") {
    val exRules = Robots.rulesFor(rfcExample, "ExampleBot")
    assert(exRules == Seq(Rule(false, "/foo"), Rule(true, "/foo/bar$")))
    // prefix-token match: 'examplebot-news/2.1' obeys the examplebot group
    assert(Robots.rulesFor(rfcExample, "examplebot-news/2.1") == exRules)
    // unrelated agent falls back to the * group
    assert(Robots.rulesFor(rfcExample, "otherbot") == Seq(Rule(false, "/")))
    // no applicable group at all => no rules => everything allowed
    assert(Robots.rulesFor("User-agent: x\nDisallow: /\n", "y").isEmpty)
  }

  // review finding (RFC 9309 §2.2.1): several groups matching at the same
  // specificity MUST combine — CMS plugins routinely emit repeated groups
  test("repeated same-token groups merge their rules") {
    val txt = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    val rules = Robots.rulesFor(txt, "anybot")
    assert(rules == Seq(Rule(false, "/a"), Rule(false, "/b")))
    assert(!Robots.isAllowed(rules, "/b/page"))
    // and the merge happens at the WINNING specificity only: a dedicated
    // group does not absorb the * group's rules
    val mixed = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nDisallow: /y\n" +
      "\nUser-agent: graftbot\nDisallow: /z\n"
    val g = Robots.rulesFor(mixed, "graftbot")
    assert(g == Seq(Rule(false, "/x"), Rule(false, "/z")))
  }

  test("longest match wins; Allow wins length ties; no match allows") {
    val rules = Robots.rulesFor(rfcExample, "examplebot")
    assert(Robots.isAllowed(rules, "/other"))          // no rule matches
    assert(!Robots.isAllowed(rules, "/foo/baz"))       // /foo disallows
    assert(Robots.isAllowed(rules, "/foo/bar"))        // longer Allow wins
    assert(!Robots.isAllowed(rules, "/foo/bar/deeper")) // $ anchor excludes
    // equal length: Allow wins (RFC §2.2.2)
    val tie = Seq(Rule(false, "/page"), Rule(true, "/page"))
    assert(Robots.isAllowed(tie, "/page/x"))
  }

  test("wildcard and anchor patterns") {
    assert(Robots.matches("/tmp*", "/tmp12/y"))
    assert(!Robots.matches("/tmp*", "/a/tmp32"))       // patterns anchor at start
    assert(Robots.matches("/*/private", "/a/private"))
    assert(Robots.matches("/a*b*c", "/a-x-b-y-c-z"))
    assert(Robots.matches("/doc$", "/doc"))
    assert(!Robots.matches("/doc$", "/docs"))
    assert(Robots.matches("/*.php$", "/index.php"))
    assert(!Robots.matches("/*.php$", "/index.php?x=1"))
  }

  test("parser: multi-agent groups, empty Disallow, comments, unknown fields") {
    val txt =
      """User-agent: a
        |User-agent: b
        |Crawl-delay: 10
        |Disallow: /x  # trailing comment
        |Disallow:
        |Sitemap: http://e.x/s.xml
        |""".stripMargin
    // both agents share the group; the empty Disallow adds no rule;
    // the trailing comment strips from the pattern
    assert(Robots.rulesFor(txt, "a") == Seq(Rule(false, "/x")))
    assert(Robots.rulesFor(txt, "b") == Seq(Rule(false, "/x")))
  }

  test("hostile inputs never throw: garbage robots, paths, hosts, html") {
    val rnd = new scala.util.Random(17)
    val garbage = (0 until 200).map { i =>
      val len = rnd.nextInt(200)
      new String(Array.fill(len)((rnd.nextInt(94) + 32).toChar)) +
        (if (i % 3 == 0) "\nUser-agent: *\nDisallow: " else "") +
        (if (i % 7 == 0) "*$*$**" else "")
    }
    garbage.foreach { txt =>
      val rules = Robots.rulesFor(txt, "bot")   // must not throw
      Robots.isAllowed(rules, "/some/path")      // nor here (wildcards quoted)
      Robots.isAllowed(rules, "")                // empty path
    }
    // registrable domain on malformed hosts: empty labels, dots, ports
    Seq("", ".", "..", "a..b", ":8080", "x.", ".x", "a.b.c.d.e.f.g.h:99999")
      .foreach(h => PublicSuffix.registrableDomain(h)) // must not throw
    assert(PublicSuffix.registrableDomain("a..b") == "")
    // extractLinks on broken markup yields rows or nothing, never an error
    val docs = Seq((1L, "<a href=\"x"), (2L, "<a href=\"\">" ),
      (3L, "</a></a><a>no href</a>")).toDF("doc_id", "html")
    assert(Html.extractLinks(docs).collect().forall(_.getString(2) != null))
  }

  test("filterAllowed kernel matches the driver evaluator; projection-only plan") {
    val docs = Seq(
      (1L, rfcExample, "/foo/bar"), (2L, rfcExample, "/foo/baz"),
      (3L, rfcExample, "/ok"), (4L, "User-agent: *\nDisallow: /\n", "/anything"))
      .toDF("doc_id", "robots", "path")
    val kept = Robots.filterAllowed(docs, "robots", "path", "examplebot")
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val p = kept.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
