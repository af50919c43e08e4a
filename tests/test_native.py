"""Native fastparse binding tests (skipped when the library isn't built —
run `make native` first)."""
import numpy as np
import pytest

from recommendit_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libfastparse.so not built (make native)"
)


class TestFastParse:
    def test_matches_python_parser(self, tmp_path, synthetic_data):
        from recommendit_tpu.data.movielens import load_movielens, save_movielens

        d = save_movielens(synthetic_data, str(tmp_path / "ml"))
        cols = native.parse_int4_file(str(d / "ratings.dat"))
        assert cols is not None
        data = load_movielens(str(d))  # itself uses native when available
        np.testing.assert_array_equal(cols[0], data.ratings["user_id"].values)
        np.testing.assert_array_equal(cols[1], data.ratings["item_id"].values)
        np.testing.assert_array_equal(cols[2], data.ratings["rating"].values)

    def test_skips_malformed_lines(self, tmp_path):
        p = tmp_path / "r.dat"
        p.write_text("1::2::3::4\nbroken line\n5::6::7::8\n1::2\n")
        cols = native.parse_int4_file(str(p))
        assert len(cols[0]) == 2
        np.testing.assert_array_equal(cols[0], [1, 5])
        np.testing.assert_array_equal(cols[3], [4, 8])

    def test_missing_file_returns_none(self):
        assert native.parse_int4_file("/nonexistent/file.dat") is None

    def test_no_trailing_newline(self, tmp_path):
        p = tmp_path / "r.dat"
        p.write_text("1::2::3::4\n9::8::7::6")
        cols = native.parse_int4_file(str(p))
        assert len(cols[0]) == 2
        np.testing.assert_array_equal(cols[1], [2, 8])
