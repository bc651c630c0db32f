package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.log._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip laws for the NDJSON action codec: any action
  * the writer can produce must parse back to an equal value, and unknown
  * JSON survives verbatim — the forward-compat contract foreign Delta
  * engines rely on (reference tests/test_delta_log.py:98-100 asserts the
  * same with hand-picked cases; scalacheck explores the space).
  */
class LogPropertySpec extends AnyFunSuite {

  /** Seeded scalacheck sampler (the scalatestplus bridge isn't in the
    * offline cache): 200 cases per law, reproducible failures.
    */
  private def forAll[A](g: Gen[A], cases: Int = 200)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(24)
    var seed = org.scalacheck.rng.Seed(42L)
    var generated = 0
    var attempts = 0
    while (generated < cases && attempts < cases * 20) {
      g.apply(params, seed) match {
        case Some(a) => f(a); generated += 1
        case None => ()
      }
      seed = seed.next
      attempts += 1
    }
    assert(generated >= cases / 2, s"generator too sparse: $generated/$cases")
  }

  private val jsonSafeString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', '.', '-', '_',
      '=', 'ü', '中', '"', '\\', '\n'))).map(_.mkString)

  private val genExtra: Gen[Map[String, JsonNode]] =
    Gen.mapOf(for {
      k <- Gen.identifier.suchThat(_.nonEmpty)
      v <- Gen.oneOf[JsonNode](
        Json.text("x"), Json.num(42L), Json.bool(true), Json.nul)
    } yield (s"x_$k", v))

  private val genAdd: Gen[AddFile] = for {
    path <- Gen.oneOf(Gen.identifier.map(_ + ".parquet"),
      jsonSafeString.map(s => s"part/$s.parquet"))
    size <- Gen.chooseNum(0L, Long.MaxValue)
    mtime <- Gen.chooseNum(0L, 4102444800000L)
    dataChange <- Arbitrary.arbBool.arbitrary
    stats <- Gen.option(Gen.const("""{"numRecords":11}"""))
    pv <- Gen.mapOf(for {
      k <- Gen.identifier.suchThat(_.nonEmpty)
      v <- Gen.option(jsonSafeString)
    } yield (k, v))
    extra <- genExtra
  } yield AddFile(path, pv, size, mtime, stats, dataChange, extra)

  private val genRemove: Gen[RemoveFile] = for {
    path <- Gen.identifier.map(_ + ".parquet")
    dataChange <- Arbitrary.arbBool.arbitrary
    ts <- Gen.chooseNum(0L, 4102444800000L)
  } yield RemoveFile(path = path, dataChange = dataChange, deletionTimestamp = ts)

  private val genTxn: Gen[Txn] = for {
    appId <- jsonSafeString.suchThat(_.nonEmpty)
    version <- Gen.chooseNum(0L, Long.MaxValue)
    updated <- Gen.option(Gen.chooseNum(0L, Long.MaxValue))
    extra <- genExtra
  } yield Txn(appId, version, updated, extra)

  test("AddFile NDJSON round-trip is the identity") {
    forAll(genAdd) { a =>
      assert(Action.parse(a.toLine) == a)
    }
  }

  test("RemoveFile NDJSON round-trip is the identity") {
    forAll(genRemove) { r =>
      assert(Action.parse(r.toLine) == r)
    }
  }

  test("Txn NDJSON round-trip is the identity") {
    forAll(genTxn) { t =>
      assert(Action.parse(t.toLine) == t)
    }
  }

  test("whole entries round-trip through NDJSON") {
    val genEntry = for {
      adds <- Gen.listOfN(3, genAdd)
      removes <- Gen.listOfN(2, genRemove)
      txn <- genTxn
    } yield DeltaLogEntry((adds ++ removes :+ txn).toVector)
    forAll(genEntry) { e =>
      assert(DeltaLogEntry.fromNdjson(e.toNdjson) == e)
    }
  }

  test("unknown action names round-trip as RawAction verbatim") {
    forAll(Gen.identifier.suchThat(n => n.nonEmpty &&
        !Set("protocol", "metaData", "add", "remove", "commitInfo", "txn")(n))) { name =>
      val line = s"""{"$name":{"a":1,"b":[true,null],"c":{"d":"x"}}}"""
      val a = Action.parse(line)
      assert(a.isInstanceOf[RawAction])
      assert(Action.parse(a.toLine) == a)
    }
  }
}
