package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PorterStemmer.stem

/** Vectors from the published algorithm description (Porter 1980),
  * step by step. */
class PorterStemmerSpec extends AnyFunSuite {

  test("step 1a") {
    assert(stem("caresses") == "caress")
    assert(stem("ponies") == "poni")
    assert(stem("ties") == "ti")
    assert(stem("caress") == "caress")
    assert(stem("cats") == "cat")
  }

  test("step 1b") {
    assert(stem("feed") == "feed")
    assert(stem("agreed") == "agre") // agreed -> agree -> step5 agre
    assert(stem("plastered") == "plaster")
    assert(stem("bled") == "bled")
    assert(stem("motoring") == "motor")
    assert(stem("sing") == "sing")
  }

  test("step 1b cleanup") {
    assert(stem("conflated") == "conflat") // conflate, then step5a drops e (m=2)
    assert(stem("troubled") == "troubl")
    assert(stem("sized") == "size")
    assert(stem("hopping") == "hop")
    assert(stem("tanned") == "tan")
    assert(stem("falling") == "fall")
    assert(stem("hissing") == "hiss")
    assert(stem("fizzed") == "fizz")
    assert(stem("failing") == "fail")
    assert(stem("filing") == "file")
  }

  test("step 1c") {
    assert(stem("happy") == "happi")
    assert(stem("sky") == "sky")
  }

  test("steps 2-4 chains") {
    assert(stem("relational") == "relat")
    assert(stem("generalization") == "gener")
    assert(stem("oscillators") == "oscil")
    assert(stem("running") == "run")
  }

  test("fixture vector (FIXTURES.md §C)") {
    assert(stem("foxes") == "fox")
    assert(stem("houses") == "hous")
  }

  test("short words untouched") {
    assert(stem("a") == "a")
    assert(stem("is") == "is")
  }
}
