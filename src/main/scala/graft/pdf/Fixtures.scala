package graft.pdf

/** The reference's 36 crafted fixture PDFs (pdf/test directory), bundled as
  * resources. They are both the conformance-test corpus and the payload pool
  * for the deterministic synthesized crawl table (graft.sources.CrawlCorpus).
  */
object Fixtures {
  val names: Seq[String] = Seq(
    "carriage_return.pdf", "comments.pdf", "empty_array.pdf",
    "empty_dictionary.pdf", "encrypted.pdf", "filter_ascii_85_decode.pdf",
    "filter_ascii_hex_decode.pdf", "filter_flate_decode.pdf",
    "filter_lzw_decode.pdf", "filter_lzw_tiff_decode.pdf",
    "filter_multiple.pdf", "filter_run_length_decode.pdf",
    "malformed_dictionary_key.pdf", "max_cmap_size.pdf", "names.pdf",
    "reference.pdf", "reference_loop.pdf", "reference_null.pdf",
    "strings.pdf", "unclosed_array.pdf", "unclosed_comment.pdf",
    "unclosed_dictionary.pdf", "unclosed_dictionary_key.pdf",
    "unclosed_hex_string.pdf", "unclosed_name.pdf",
    "unclosed_name_escape_1.pdf", "unclosed_name_escape_2.pdf",
    "unclosed_string.pdf", "unclosed_string_escape.pdf",
    "unclosed_string_octal_1.pdf", "unclosed_string_octal_2.pdf",
    "xref_loop.pdf", "xref_repair.pdf", "xref_stream_chain.pdf",
    "xref_stream_index_default.pdf", "xref_table_chain.pdf")

  def bytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixtures/" + name)
    require(in != null, s"missing fixture resource: $name")
    try in.readAllBytes()
    finally in.close()
  }

  /** All fixtures, name -> payload. */
  lazy val all: Seq[(String, Array[Byte])] = names.map(n => n -> bytes(n))
}
