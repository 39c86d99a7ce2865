"""Golden tests for the text kernels — semantics pinned against the
reference (yonasBSD/readur): exact passthrough (src/tests/ocr_tests.rs:64-79),
word-count rules (src/ocr/enhanced.rs:1487-1558), gates
(enhanced.rs:923-976, 1562-1597)."""

from readur_spark.kernels import text as k


class TestReadPlainText:
    def test_exact_passthrough(self):
        # mirrors src/tests/ocr_tests.rs:64-79 assert_eq!(extracted, content)
        content = "Hello, World! This is a test document."
        assert k.read_plain_text(content.encode()) == content

    def test_trim(self):
        assert k.read_plain_text(b"  spaced out \n") == "spaced out"

    def test_unicode_passthrough(self):
        content = "café naïve résumé — 'quotes' • bullets"
        assert k.read_plain_text(content.encode("utf-8")) == content

    def test_truncation_suffix(self):
        body = "a" * (k.MAX_TEXT_CONTENT_SIZE + 10)
        out = k.read_plain_text(body.encode())
        assert out.endswith(k.TRUNCATION_SUFFIX)
        assert len(out) == k.MAX_TEXT_CONTENT_SIZE + len(k.TRUNCATION_SUFFIX)

    def test_truncation_multibyte_boundary(self):
        """Pin the documented deviation at the 10 MB truncation cut: a
        multi-byte char straddling the boundary is DROPPED (decode with
        errors='ignore'), where the reference's byte slice
        (enhanced.rs:1462-1467, Rust `&text[..MAX]`) would panic on a
        non-char-boundary. The engine never panics mid-batch; the
        partial char is elided and the suffix appended."""
        # 'é' = 2 bytes; place its first byte at index MAX-1
        body = b"a" * (k.MAX_TEXT_CONTENT_SIZE - 1) + "é".encode("utf-8") + b"tail"
        out = k.read_plain_text(body)
        assert out == "a" * (k.MAX_TEXT_CONTENT_SIZE - 1) + k.TRUNCATION_SUFFIX
        # a char ending exactly ON the boundary survives intact
        body2 = b"a" * (k.MAX_TEXT_CONTENT_SIZE - 2) + "é".encode("utf-8") + b"tail"
        out2 = k.read_plain_text(body2)
        assert out2 == "a" * (k.MAX_TEXT_CONTENT_SIZE - 2) + "é" + k.TRUNCATION_SUFFIX

    def test_size_gate(self):
        import pytest

        data = b"x" * (k.MAX_TEXT_FILE_SIZE + 1)
        with pytest.raises(k.ExtractError, match="too large"):
            k.read_plain_text(data)

    def test_invalid_utf8(self):
        import pytest

        with pytest.raises(k.ExtractError):
            k.read_plain_text(b"\xff\xfe\x80plain")


class TestWordCount:
    def test_whitespace_split(self):
        assert k.count_words_in_text("one two three") == 3
        assert k.count_words_in_text("  padded   words  ") == 2

    def test_empty(self):
        assert k.count_words_in_text("") == 0
        assert k.count_words_in_text("   ") == 0

    def test_single_short_token(self):
        # 1 word, ≤15 bytes → stays 1 (no fallback)
        assert k.count_words_in_text("short") == 1

    def test_camel_case_fallback(self):
        # 1 long token → camelCase transitions + 1
        # this|Is|Camel|Case|Text = 4 transitions + 1
        assert k.count_words_in_text("thisIsCamelCaseText") == 5

    def test_letter_digit_transitions(self):
        # abc123def: a→1 transition at c→1, 3→d = 2 transitions + 1 = 3
        assert k.count_words_in_text("abcdefghij123defghijkl") == 3

    def test_continuous_no_transitions(self):
        # 20 lowercase letters, no transitions → alnum//5 = 4
        assert k.count_words_in_text("abcdefghijklmnopqrst") == 4

    def test_pure_punctuation_long(self):
        assert k.count_words_in_text("!!!???!!!???!!!???!!") == 0

    def test_sampling_extrapolation(self):
        text = ("word " * 250_000).strip()  # 1.25 MB, 250k words
        n = k.count_words_safely(text)
        # exact = 250_000; sampled estimate must be within 1%
        assert abs(n - 250_000) <= 2_500

    def test_cap_10m(self):
        text = "a " * 600_000  # 1.2MB
        # craft artificial: extrapolation can't exceed 10M anyway
        assert k.count_words_safely(text) <= 10_000_000


class TestQualityGates:
    def test_zero_words_fail(self):
        assert not k.is_text_extraction_quality_sufficient("", 0, 1000)

    def test_small_file_one_word_pass(self):
        assert k.is_text_extraction_quality_sufficient("hello", 1, 49_999)

    def test_substantial_words_pass(self):
        text = "word " * 50
        assert k.is_text_extraction_quality_sufficient(text, 50, 10_000_000)

    def test_low_density_fail(self):
        # large file, few words → density < 5/KB and < 10 words
        assert not k.is_text_extraction_quality_sufficient("a b c", 3, 1_000_000)

    def test_low_alnum_ratio_fail(self):
        text = "!! @@ ## $$ %% ^^ && ** (( ))"  # 10 words, 0% alnum
        assert not k.is_text_extraction_quality_sufficient(text, 10, 60_000)

    def test_validate_confidence_threshold(self):
        assert not k.validate_ocr_quality("good text here", 29.9, 3)
        assert k.validate_ocr_quality("good text here", 30.0, 3)

    def test_validate_zero_words(self):
        assert not k.validate_ocr_quality("", 99.0, 0)

    def test_validate_alnum_ratio(self):
        assert not k.validate_ocr_quality("... --- !!!", 99.0, 3)
