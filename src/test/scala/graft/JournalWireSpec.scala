package graft.api

import java.util.TimeZone

import org.scalatest.funsuite.AnyFunSuite

/** Wire timestamps are UTC regardless of the driver's default zone
  * (reference: everything UTC — tests/test_utc.py,
  * helpers/statements.py:30-40). The naive-form fallback used to parse in
  * the JVM default zone, so the same wire text ordered differently on
  * differently-zoned drivers and flipped last-writer-wins in the journal
  * drain; offset forms were rejected outright. This spec pins the JVM
  * zone to either side of UTC and asserts all spellings of one instant
  * agree.
  */
class JournalWireSpec extends AnyFunSuite {

  private def inZone[T](zone: String)(body: => T): T = {
    val prev = TimeZone.getDefault
    TimeZone.setDefault(TimeZone.getTimeZone(zone))
    try body finally TimeZone.setDefault(prev)
  }

  private val wantMs = java.time.Instant.parse("2024-03-01T12:30:00Z").toEpochMilli

  test("parseTs: naive, Z and offset spellings of one instant agree in any driver zone") {
    for (zone <- Seq("UTC", "America/New_York", "Asia/Tokyo")) inZone(zone) {
      val spellings = Seq(
        "2024-03-01T12:30:00Z",      // instant form
        "2024-03-01T12:30:00",       // naive ISO — UTC by contract
        "2024-03-01 12:30:00",       // naive space form (CSV-ish wires)
        "2024-03-01T14:30:00+02:00", // offset form
        "2024-03-01T07:30:00-05:00")
      for (s <- spellings)
        assert(JournalWire.parseTs(s).getTime == wantMs,
          s"`$s` in driver zone $zone")
    }
  }

  test("parseTs: fractional seconds survive every form") {
    inZone("Asia/Tokyo") {
      val want = java.time.Instant.parse("2024-03-01T12:30:00.250Z").toEpochMilli
      assert(JournalWire.parseTs("2024-03-01T12:30:00.250Z").getTime == want)
      assert(JournalWire.parseTs("2024-03-01 12:30:00.250").getTime == want)
      assert(JournalWire.parseTs("2024-03-01T14:30:00.250+02:00").getTime == want)
    }
  }

  test("parseTs: garbage still fails loudly") {
    intercept[Exception](JournalWire.parseTs("not-a-timestamp"))
  }
}
