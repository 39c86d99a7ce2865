"""kernels/markdown.py — HTML → GitHub-markdown rendering."""

from __future__ import annotations

from readur_spark.kernels.markdown import html_to_markdown as md


class TestBlocks:
    def test_headings_and_paragraphs(self):
        h = "<h1>A</h1><p>one</p><h3>B</h3><p>two</p>"
        assert md(h) == "# A\n\none\n\n### B\n\ntwo"

    def test_kill_tags_vanish(self):
        h = ("<title>t</title><nav>n</nav><header>h</header>"
             "<script>s()</script><p>kept</p><footer>f</footer>")
        assert md(h) == "kept"

    def test_pre_keeps_whitespace_verbatim(self):
        h = "<p>x</p><pre>a   b\n  c</pre>"
        assert md(h) == "x\n\n```\na   b\n  c\n```"

    def test_blockquote_prefixes_nested(self):
        h = ("<blockquote><p>q1</p>"
             "<blockquote><p>q2</p></blockquote></blockquote>")
        assert md(h) == "> q1\n\n> > deeper".replace("deeper", "q2")

    def test_plain_text_passthrough(self):
        assert md("no tags at all") == "no tags at all"
        assert md("") == ""


class TestLists:
    def test_ul_items_group_into_one_block(self):
        h = "<ul><li>a</li><li>b</li></ul><p>after</p>"
        assert md(h) == "- a\n- b\n\nafter"

    def test_ol_numbering(self):
        h = "<ol><li>a</li><li>b</li><li>c</li></ol>"
        assert md(h) == "1. a\n2. b\n3. c"

    def test_nested_list_indents(self):
        h = "<ul><li>a</li><ol><li>x</li></ol><li>b</li></ul>"
        assert md(h) == "- a\n  1. x\n- b"


class TestInlines:
    def test_emphasis_links_images(self):
        h = ('<p>see <b>bold</b> <i>it</i> <code>c()</code> '
             '<a href="https://x/">lnk</a> <img src="i.png" alt="p"></p>')
        assert md(h) == "see **bold** *it* `c()` [lnk](https://x/) ![p](i.png)"

    def test_whitespace_normalized(self):
        h = "<p>a\n\n   b\t c</p>"
        assert md(h) == "a b c"

    def test_unclosed_inline_tolerated(self):
        assert md("<p>unclosed <b>bold") == "unclosed **bold"


class TestTables:
    def test_pipe_table_block(self):
        h = ("<p>pre</p><table><tr><th>k</th><th>v</th></tr>"
             "<tr><td>a</td><td>b|c</td></tr></table><p>post</p>")
        assert md(h) == (
            "pre\n\n| k | v |\n| --- | --- |\n| a | b\\|c |\n\npost"
        )

    def test_markup_inside_cells_is_plain_text(self):
        h = "<table><tr><td><b>x</b> y</td></tr></table>"
        assert md(h) == "| x y |\n| --- |"
