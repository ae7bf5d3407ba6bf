package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class LlmJsonRepairSpec extends AnyFunSuite {

  test("strategy 1: direct parse") {
    assert(LlmJsonRepair.extract("""{"Rejected": {"123": "not medically necessary"}}""", "Rejected")
      == Map("123" -> "not medically necessary"))
  }

  test("strategy 2: fenced block") {
    val raw = "Here is the result:\n```json\n{\"Rejected\": {\"42\": \"duplicate service\"}}\n```\nDone."
    assert(LlmJsonRepair.extract(raw, "Rejected") == Map("42" -> "duplicate service"))
  }

  test("strategy 3: balanced-brace substring") {
    val raw = """The answer is {"77": "excluded by policy"} as shown above"""
    assert(LlmJsonRepair.extract(raw) == Map("77" -> "excluded by policy"))
  }

  test("strategy 3 respects braces inside strings") {
    val raw = """x {"a": "open { brace", "b": "close } brace"} y"""
    assert(LlmJsonRepair.extract(raw) == Map("a" -> "open { brace", "b" -> "close } brace"))
  }

  test("strategy 4: uid-pair scraping on truncated json") {
    val raw = """{"10101": "missing diagnosis", "10202": "not covered" ...truncated"""
    val out = LlmJsonRepair.extract(raw)
    assert(out == Map("10101" -> "missing diagnosis", "10202" -> "not covered"))
  }

  test("strategy 4 rescues unquoted keys and values (reference regex shape)") {
    val raw = """Rejected services: 10101: missing diagnosis for this visit"""
    assert(LlmJsonRepair.extract(raw) == Map("10101" -> "missing diagnosis for this visit"))
  }

  test("strategy 4 does NOT rescue non-uid pairs — prose with echoed schema text is a parse failure") {
    // A refusal/prose response containing a quoted pair must not count
    // as parsed: its non-numeric keys would vanish in the uid try_cast
    // join-back and the visit would silently default to Approved.
    val raw = """I reviewed the claim. "analysis": "the visit looks fine", nothing to reject."""
    assert(LlmJsonRepair.repairStrict(raw, "Rejected").isEmpty,
      "non-uid quoted pairs must route to the retry pass, not parse")
    // Short numeric ids (< 5 digits) and short reasons (< 10 chars) are
    // below the reference's rescue thresholds too.
    assert(LlmJsonRepair.repairStrict("""oops {"101": "missing diagnosis territory""", "Rejected").isEmpty)
    assert(LlmJsonRepair.repairStrict("""oops {"10101": "too short""", "Rejected").isEmpty)
  }

  test("strategy 5: empty fallback") {
    assert(LlmJsonRepair.extract("I cannot help with that.") == Map.empty)
    assert(LlmJsonRepair.extract(null) == Map.empty)
  }

  test("strict: parse failure is None, never an empty map") {
    assert(LlmJsonRepair.repairStrict("I cannot help with that.", "Rejected").isEmpty)
    assert(LlmJsonRepair.repairStrict(null, "Rejected").isEmpty)
    assert(LlmJsonRepair.repairStrict("", "Rejected").isEmpty)
    // An array is not the object shape the contract expects either.
    assert(LlmJsonRepair.repairStrict("[1, 2, 3]", "Rejected").isEmpty)
  }

  test("strict: a legitimately empty rejection map is Some(empty), not a failure") {
    assert(LlmJsonRepair.repairStrict("""{"Rejected": {}}""", "Rejected") == Some(Map.empty))
    assert(LlmJsonRepair.repairStrict("{}", "Rejected") == Some(Map.empty))
    assert(LlmJsonRepair.repairStrict("```json\n{\"Rejected\": {}}\n```", "Rejected")
      == Some(Map.empty))
    // Validators emptying a parsed map is also NOT a parse failure.
    assert(LlmJsonRepair.repairStrict("""{"Rejected": {"9": "Approved after review"}}""", "Rejected")
      == Some(Map.empty))
  }

  test("validateKeys splits comma-joined ids") {
    assert(LlmJsonRepair.validateKeys(Map("123,456" -> "r", "7" -> "s"))
      == Map("123" -> "r", "456" -> "r", "7" -> "s"))
  }

  test("validateOutcome drops reasons that say approved") {
    assert(LlmJsonRepair.validateOutcome(Map("1" -> "This service is Approved", "2" -> "rejected: no auth"))
      == Map("2" -> "rejected: no auth"))
  }

  test("full repair pipeline") {
    val raw = "```json\n{\"Rejected\": {\"1,2\": \"dup service\", \"3\": \"actually approved\"}}\n```"
    assert(LlmJsonRepair.repair(raw, "Rejected") == Map("1" -> "dup service", "2" -> "dup service"))
  }
}
