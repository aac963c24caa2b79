package graft.ops

import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check => scCheck, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Encryption parity (/root/reference/tests/test_encryption.py) +
  * round-trip property. */
class CryptoSpec extends AnyFunSuite {
  private val codec = AesCodec.fromEnv()

  test("encrypt/decrypt roundtrip; ciphertext differs from plaintext") {
    val original = "John Doe, DOB 1985-03-22, SSN 123-45-6789"
    val encrypted = codec.encrypt(original)
    assert(encrypted != original)
    assert(codec.decrypt(encrypted) == original)
  }

  test("empty string passes through") {
    assert(codec.encrypt("") == "")
    assert(codec.decrypt("") == "")
  }

  test("null passes through") {
    assert(codec.encrypt(null) == null)
    assert(codec.decrypt(null) == null)
  }

  test("nondeterministic: two encryptions of the same value differ (fresh IV)") {
    assert(codec.encrypt("x") != codec.encrypt("x"))
  }

  test("different keys cannot decrypt each other's output") {
    val other = AesCodec.fromEnv()
    val ct = codec.encrypt("secret")
    intercept[Exception](other.decrypt(ct))
  }

  test("property: decrypt ∘ encrypt == id for arbitrary strings") {
    val result = scCheck(Parameters.default,
      forAll { (s: String) => codec.decrypt(codec.encrypt(s)) == s })
    assert(result.passed, result.status.toString)
  }
}
