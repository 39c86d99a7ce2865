"""kernels/tables.py — HTML table → GitHub-markdown extraction."""

from __future__ import annotations

from readur_spark.kernels.tables import extract_tables_markdown as x


class TestTableKernel:
    def test_basic_pipe_table(self):
        h = ("<table><tr><th>k</th><th>v</th></tr>"
             "<tr><td>a</td><td>1</td></tr></table>")
        assert x(h) == [
            (0, "| k | v |\n| --- | --- |\n| a | 1 |", 2, 2)
        ]

    def test_nested_table_gets_own_index_and_text(self):
        """Inner table text never leaks into the outer cell; indices
        follow OPEN order so the inner table numbers after its host."""
        h = ("<table><tr><td>outer"
             "<table><tr><td>inner</td></tr></table>"
             "</td><td>b</td></tr></table>")
        got = x(h)
        assert got == [
            (0, "| outer | b |\n| --- | --- |", 1, 2),
            (1, "| inner |\n| --- |", 1, 1),
        ]

    def test_empty_table_dropped_but_consumes_index(self):
        h = ("<table></table>"
             "<table><tr><td>real</td></tr></table>")
        assert x(h) == [(1, "| real |\n| --- |", 1, 1)]

    def test_pipes_escaped_rows_padded(self):
        h = ("<table><tr><td>a|b</td><td></td><td>c</td></tr>"
             "<tr><td>only</td></tr></table>")
        (idx, md, nr, nc), = x(h)
        assert (idx, nr, nc) == (0, 2, 3)
        assert md.splitlines() == [
            "| a\\|b |  | c |",
            "| --- | --- | --- |",
            "| only |  |  |",
        ]

    def test_tag_soup_unclosed_rows_and_cells(self):
        """Implicit cell/row closes (the HTML5 tree-builder behavior
        HTMLParser approximates through our flush-on-open rule)."""
        h = "<table><td>x<td>y<tr><td>z</table>"
        assert x(h) == [
            (0, "| x | y |\n| --- | --- |\n| z |  |", 2, 2)
        ]

    def test_whitespace_normalized_markup_stripped(self):
        h = ("<table><tr><td>  a\n\n <b>bold</b>\tend </td></tr></table>")
        (_, md, _, _), = x(h)
        assert md == "| a bold end |\n| --- |"

    def test_no_tables(self):
        assert x("<p>nothing here</p>") == []

    def test_entities_decoded(self):
        h = "<table><tr><td>a &amp; b &lt;c&gt;</td></tr></table>"
        (_, md, _, _), = x(h)
        assert md == "| a & b <c> |\n| --- |"


class TestRelational:
    def test_header_election_and_tuples(self):
        from readur_spark.kernels.tables import extract_tables_relational

        html = ("<table><tr><th>name</th><th>age</th></tr>"
                "<tr><td>ada</td><td>36</td></tr>"
                "<tr><td>alan</td><td>41</td></tr></table>")
        got = extract_tables_relational(html)
        assert got == [
            (0, 0, 0, "name", "ada", True),
            (0, 0, 1, "age", "36", True),
            (0, 1, 0, "name", "alan", True),
            (0, 1, 1, "age", "41", True),
        ]

    def test_headerless_positional_names(self):
        from readur_spark.kernels.tables import extract_tables_relational

        html = ("<table><tr><td>a</td><td>b</td></tr>"
                "<tr><td>c</td><td>d</td></tr></table>")
        got = extract_tables_relational(html)
        assert got[0] == (0, 0, 0, "col0", "a", False)
        assert len(got) == 4 and all(not g[5] for g in got)

    def test_ragged_padding_and_empty_header_fallback(self):
        from readur_spark.kernels.tables import extract_tables_relational

        # header covers 2 cols but a data row has 3 → col2 falls back
        html = ("<table><tr><th>x</th><th></th></tr>"
                "<tr><td>1</td><td>2</td><td>3</td></tr></table>")
        got = extract_tables_relational(html)
        names = [g[3] for g in got]
        assert names == ["x", "col1", "col2"]  # empty th → positional
        assert [g[4] for g in got] == ["1", "2", "3"]

    def test_markdown_path_unchanged_by_th_tracking(self):
        from readur_spark.kernels.tables import extract_tables_markdown

        html = ("<table><tr><th>k</th></tr><tr><td>v</td></tr></table>")
        [(idx, md, nr, nc)] = extract_tables_markdown(html)
        assert (idx, nr, nc) == (0, 2, 1)
        assert md.splitlines()[0] == "| k |"


class TestColumnTypes:
    def test_majority_and_tiebreak(self, spark):
        from readur_spark.queries.extraction import column_types

        rows = [
            # col 0: 2 ints + 1 string -> int, 66%
            (1, 0, 0, 0, "c0", "12", False),
            (1, 0, 1, 0, "c0", "-7", False),
            (1, 0, 2, 0, "c0", "abc", False),
            # col 1: 1 date + 1 decimal (tie) -> alphabetically first =
            # 'date', 50%
            (1, 0, 0, 1, "c1", "2024-01-02", False),
            (1, 0, 1, 1, "c1", "3.14", False),
            # col 2: empty cells don't vote
            (1, 0, 0, 2, "c2", "", False),
            (1, 0, 1, 2, "c2", "x", False),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, table_idx int, row_idx int, col_idx int, "
            "col_name string, value string, has_header boolean",
        )
        got = {r["col_idx"]: r for r in column_types(df).collect()}
        assert (got[0]["inferred_type"], got[0]["type_share_pct"]) == ("int", 66)
        assert (got[1]["inferred_type"], got[1]["type_share_pct"]) == ("date", 50)
        assert (got[2]["inferred_type"], got[2]["n_cells"]) == ("string", 1)
