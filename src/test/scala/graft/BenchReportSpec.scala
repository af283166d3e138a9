package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench self-report's tail-window contract: the consumer of the
  * bench stdout keeps only the LAST 2000 characters, so the final printed
  * line — `Bench.qmsLine` — must fit that window together with the cut-off
  * remains of the preceding full-detail line, for the real catalog size and
  * worst-case timing magnitudes. r3-r5 shipped summary lines of 2877+ chars
  * and the consumer parsed null three rounds running; this spec makes that
  * class of regression a test failure instead.
  */
class BenchReportSpec extends AnyFunSuite {

  private val names = queries.Catalog.all.map(_.name).sorted
  // Worst-case magnitudes: every query at 100+ seconds (6-digit ms) with
  // the spread signal saturated at its 999 cap.
  private val slow = names.map(_ => 123.456789)
  private val spreads = names.map(_ => 999)

  test("qms line fits the 2000-char tail window with headroom") {
    val line = Bench.qmsLine(slow.sum, "/root/testdata/sf0.1", slow, spreads)
    assert(line.length < 1200,
      s"qms line is ${line.length} chars for ${names.size} queries — " +
        "must stay well under the consumer's 2000-char tail window")
  }

  test("qms line is the last complete line of a tail -c 2000 cut") {
    val full = "{\"metric\":\"total\"," + "x" * 8000 + "}" // stand-in for the detail line
    val out = full + "\n" + Bench.qmsLine(slow.sum, "/root/testdata/sf0.1", slow, spreads) + "\n"
    val tail = out.takeRight(2000)
    val lastComplete = tail.split("\n").filter(_.nonEmpty).last
    assert(lastComplete.startsWith("{\"metric\":\"qms\""))
    assert(lastComplete.endsWith("]}"))
    // one integer-ms entry per catalog query, recoverable by sorted name
    val v = lastComplete.split("\"v\":\\[")(1).stripSuffix("]}").split(",")
    assert(v.length == names.size)
    assert(v.forall(_.matches("-?\\d+")))
  }

  test("qms values are integer milliseconds in name-sorted order") {
    val line = Bench.qmsLine(0.3, "sf", Seq(0.1, 0.2), Seq(5, 1400))
    assert(line.contains("\"n\":2"))
    assert(line.contains("\"v\":[100,200]"))
    assert(line.contains("\"value\":0.3"))
    // spread percent is capped at 999 so a pathological run can't blow the
    // line budget
    assert(line.contains("\"spr\":[5,999]"))
  }
}
