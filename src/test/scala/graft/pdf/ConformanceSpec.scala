package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.time.{Span, Seconds}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Transcription of all 36 reference tests
  * (/root/reference/pdf/unit_test.go) against the same fixture PDFs
  * (src/main/resources/graft/fixtures). The inline golden values from
  * unit_test.go ARE the byte-identical oracle. The 1-second timeouts mirror
  * the reference's DoS tests (unit_test.go:316-351 et al.).
  */
class ConformanceSpec extends AnyFunSuite with TimeLimits {

  def fixture(name: String): Array[Byte] = Fixtures.bytes(name)

  def load(name: String, password: String = ""): PdfParser = {
    val p = new PdfParser(fixture(name), null)
    val err = p.load(password.getBytes(ISO_8859_1))
    assert(err == null, s"load failed: $err")
    p
  }

  def str(b: Array[Byte]): String = new String(b, ISO_8859_1)

  test("Comments") {
    val p = load("comments.pdf")
    assert(p.getObject(1).value.str == "(%this is not a comment)")
  }

  test("EmptyArray") {
    assert(load("empty_array.pdf").getObject(1).value.str == "[]")
  }

  test("EmptyDictionary") {
    assert(load("empty_dictionary.pdf").getObject(1).value.str == "<<>>")
  }

  test("Encrypted") {
    val p = load("encrypted.pdf")
    val d12 = p.getObject(12).value match {
      case d: PDict => d
      case other    => fail(s"expected dictionary, got ${other.str}")
    }
    assert(d12.getString("Lang").map(str).contains("en-US"))
    val o8 = p.getObject(8)
    assert(str(o8.stream.take(8)) == "/CIDInit")
  }

  test("FilterASCII85Decode") {
    val p = load("filter_ascii_85_decode.pdf")
    assert(str(p.getObject(1).stream) == "\u0000\u0000\u0000\u0000%!FontType")
  }

  test("FilterASCIIHexDecode") {
    assert(str(load("filter_ascii_hex_decode.pdf").getObject(1).stream) == "Hellop")
  }

  test("FilterFlateDecode") {
    assert(str(load("filter_flate_decode.pdf").getObject(1).stream) ==
      "hello world\nhello world\nhello world\nhello world\nhello world\n")
  }

  test("FilterLZWDecode") {
    assert(str(load("filter_lzw_decode.pdf").getObject(1).stream) == "hello world!")
  }

  test("FilterLZWTiffDecode") {
    assert(str(load("filter_lzw_tiff_decode.pdf").getObject(1).stream) == "hello world!")
  }

  test("FilterMultiple") {
    assert(str(load("filter_multiple.pdf").getObject(1).stream) ==
      "hello world\nhello world\nhello world\nhello world\nhello world\n")
  }

  test("FilterRunLengthDecode") {
    assert(str(load("filter_run_length_decode.pdf").getObject(1).stream) == "Hello")
  }

  test("MalformedDictionaryKey") {
    val p = load("malformed_dictionary_key.pdf")
    p.getObject(1).value match {
      case d: PDict =>
        assert(d.getString("HiddenObject").map(str).contains("Hello World"))
      case _ => // Go test only asserts when the value is a dictionary
    }
  }

  test("MaxCmapSize") {
    failAfter(Span(1, Seconds)) {
      val p = load("max_cmap_size.pdf")
      p.getObject(1).value match {
        case d: PDict => Font.newFont(d)
        case _        =>
      }
    }
  }

  test("Names") {
    assert(load("names.pdf").getObject(1).value.str == "/Hello /World!\u0000qz")
  }

  test("Reference") {
    val p = load("reference.pdf")
    val ref = p.getObject(1).value match {
      case r: PRef => r
      case other   => fail(s"object is not a reference: ${other.str}")
    }
    assert(ref.resolve().str == "(Hello World!)")
  }

  test("ReferenceLoop") {
    failAfter(Span(1, Seconds)) {
      val p = load("reference_loop.pdf")
      val ref = p.getObject(1).value match {
        case r: PRef => r
        case other   => fail(s"object is not a reference: ${other.str}")
      }
      assert(ref.resolve().str == "null")
    }
  }

  test("ReferenceNull") {
    val p = load("reference_null.pdf")
    val ref = p.getObject(1).value match {
      case r: PRef => r
      case other   => fail(s"object is not a reference: ${other.str}")
    }
    assert(ref.resolve().str == "null")
  }

  test("CarriageReturn") {
    assert(str(load("carriage_return.pdf").getObject(1).stream) == "Hello")
  }

  test("Strings") {
    val arr = load("strings.pdf").getObject(1).value match {
      case a: PArray => a
      case other     => fail(s"object is not an Array: ${other.str}")
    }
    assert(arr.items(0).str ==
      "(newline\nnewline char\nno newline(balance parens allowed) escaped paren ) \\n Hello??7)")
    assert(arr.items(1).str == "(Hellop)")
    assert(arr.items(2).str == "()")
    assert(arr.items(3).str == "()")
  }

  test("UnclosedArray") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_array.pdf").getObject(1).value.str == "[]")
    }
  }

  test("UnclosedComment") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_comment.pdf").getObject(1).value.str == "null")
    }
  }

  test("UnclosedDictionary") {
    failAfter(Span(1, Seconds)) {
      load("unclosed_dictionary.pdf").getObject(1)
    }
  }

  test("UnclosedDictionaryKey") {
    failAfter(Span(1, Seconds)) {
      load("unclosed_dictionary_key.pdf").getObject(1)
    }
  }

  test("UnclosedHexString") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_hex_string.pdf").getObject(1).value.str == "()")
    }
  }

  test("UnclosedName") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_name.pdf").getObject(1).value.str == "/")
    }
  }

  test("UnclosedNameEscape1") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_name_escape_1.pdf").getObject(1).value.str == "/\u0000")
    }
  }

  test("UnclosedNameEscape2") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_name_escape_2.pdf").getObject(1).value.str == "/0")
    }
  }

  test("UnclosedString") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_string.pdf").getObject(1).value.str == "()")
    }
  }

  test("UnclosedStringEscape") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_string_escape.pdf").getObject(1).value.str == "(\\)")
    }
  }

  test("UnclosedStringOctal1") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_string_octal_1.pdf").getObject(1).value.str == "(\u0001)")
    }
  }

  test("UnclosedStringOctal2") {
    failAfter(Span(1, Seconds)) {
      assert(load("unclosed_string_octal_2.pdf").getObject(1).value.str == "(\n)")
    }
  }

  test("XrefLoop") {
    failAfter(Span(1, Seconds)) {
      assert(load("xref_loop.pdf").xref.size == 10)
    }
  }

  test("XrefRepair") {
    val p = load("xref_repair.pdf")
    assert(p.xref.size == 9, s"${p.xref.size} != 9")
    assert(p.getObject(9).value.str == "(Hello world)")
  }

  test("XrefStreamChain") {
    val p = load("xref_stream_chain.pdf")
    assert(p.xref.size == 11, s"${p.xref.size} != 11")
    assert(p.getObject(10).value.str == "(Hello World!)")
  }

  test("XrefStreamIndexDefault") {
    val p = load("xref_stream_index_default.pdf")
    assert(p.xref.size == 10, s"${p.xref.size} != 10")
    assert(p.getObject(9).value.str == "(Hello World!)")
  }

  test("XrefTableChain") {
    assert(load("xref_table_chain.pdf").xref.size == 10)
  }
}
