"""Native C++ encoder: bit-exact parity with the Python encoders + speed."""

import time

import numpy as np
import pytest

from nngp_tpu.featurize.encoder import SingleTableEncoder
from nngp_tpu.featurize.join import MultiJoinEncoder
from nngp_tpu.featurize.parser import parse_single_table_line
from nngp_tpu.featurize.stats import ColumnStats, TableStats

native = pytest.importorskip("nngp_tpu.native")
if not native.is_available():
    pytest.skip("g++ unavailable", allow_module_level=True)


def _tables():
    a = TableStats("ta", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("x", "numerical", -10, 10),
        ColumnStats("tag", "categorical", categories=tuple(range(13))),
    ), chunk_size=5)
    b = TableStats("tb", (
        ColumnStats("id", "numerical", 0, 100),
        ColumnStats("y", "numerical", 0, 1),
    ), chunk_size=5)
    return [a, b]


def _multi_lines(n=200, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        cats = ",".join(str(c) for c in sorted(
            rng.choice(13, size=rng.integers(1, 4), replace=False)))
        if i % 3 == 0:
            lines.append(f"ta,tb@x,{xu:.6f},{xl:.6f}#tag,{cats}@@ta,tb,id@{i+1}")
        elif i % 3 == 1:
            lines.append(f"ta,tb@@y,0.9,0.1@ta,tb,id@{i+1}")
        else:
            lines.append(f"tb@y,{rng.uniform(0,1):.6f},0.0@@{i+1}")
    return lines


def test_multi_join_native_matches_python():
    tables = _tables()
    enc_py = MultiJoinEncoder(tables)
    enc_c = native.FastEncoder(tables)
    lines = _multi_lines()
    x_c, cards_c, nt, npd, nj = enc_c.encode_multi("\n".join(lines))

    parsed = [enc_py.parse_line(l) for l in lines]
    x_py = enc_py.encode_batch([(t, p, j) for (t, p, j, _) in parsed])
    cards_py = [c for (_, _, _, c) in parsed]

    np.testing.assert_array_equal(x_c, x_py)
    np.testing.assert_array_equal(cards_c, cards_py)
    np.testing.assert_array_equal(nt, [len(t) for (t, _, _, _) in parsed])
    np.testing.assert_array_equal(
        npd, [sum(len(pl) for pl in p) for (_, p, _, _) in parsed])
    np.testing.assert_array_equal(nj, [len(j) for (_, _, j, _) in parsed])


def test_cardless_lines():
    tables = _tables()
    enc_c = native.FastEncoder(tables)
    enc_py = MultiJoinEncoder(tables)
    lines = ["ta,tb@x,5.0,-5.0@@ta,tb,id", "tb@y,0.5,0.1@"]
    x_c, cards, *_ = enc_c.encode_multi("\n".join(lines), with_card=False)
    parsed = [enc_py.parse_line_without_card(l) for l in lines]
    x_py = enc_py.encode_batch(parsed)
    np.testing.assert_array_equal(x_c, x_py)
    assert cards is None


def test_single_table_native_matches_python():
    tables = _tables()
    enc_c = native.FastEncoder(tables)
    st = tables[0]
    enc_py = SingleTableEncoder(st)
    rng = np.random.default_rng(1)
    lines = []
    for i in range(100):
        xu = rng.uniform(-10, 10)
        xl = rng.uniform(-10, xu)
        lines.append(f"x,{xu:.6f},{xl:.6f}#tag,{rng.integers(0,13)}@{i+1}")
    x_c, cards, npd = enc_c.encode_single("\n".join(lines))
    parsed = [parse_single_table_line(l, st) for l in lines]
    x_py = enc_py.encode_batch([p for p, _ in parsed])
    np.testing.assert_array_equal(x_c, x_py)
    np.testing.assert_array_equal(cards, [c for _, c in parsed])


def test_parse_error_reports_line():
    enc_c = native.FastEncoder(_tables())
    with pytest.raises(ValueError, match="line 2"):
        enc_c.encode_multi("ta@@@1\nbogus_table@@@2")


def test_native_speedup():
    tables = _tables()
    enc_py = MultiJoinEncoder(tables)
    enc_c = native.FastEncoder(tables)
    lines = _multi_lines(4000, seed=2)
    text = "\n".join(lines)

    t0 = time.perf_counter()
    x_c, *_ = enc_c.encode_multi(text)
    t_c = time.perf_counter() - t0

    t0 = time.perf_counter()
    parsed = [enc_py.parse_line(l) for l in lines]
    x_py = enc_py.encode_batch([(t, p, j) for (t, p, j, _) in parsed])
    t_py = time.perf_counter() - t0

    np.testing.assert_array_equal(x_c, x_py)
    assert t_c < t_py  # must actually be faster
    print(f"native {t_c*1000:.1f} ms vs python {t_py*1000:.1f} ms "
          f"({t_py/t_c:.1f}x)")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_multi_join_native_fuzz_random_schemas(seed):
    """Bit-exact parity on RANDOMIZED schemas (table/column counts, ranges,
    vocab sizes, chunk sizes) and randomized queries — edge cases the fixed
    fixture can't reach (wide cat chunks, negative ranges, 1-column
    tables, all-tables queries)."""
    rng = np.random.default_rng(seed)
    n_tables = int(rng.integers(2, 5))
    tables = []
    for t in range(n_tables):
        cols = [ColumnStats("id", "numerical", 0, 50)]
        for c in range(int(rng.integers(1, 4))):
            if rng.random() < 0.5:
                lo = float(rng.uniform(-100, 50))
                hi = lo + float(rng.uniform(1e-3, 200))
                cols.append(ColumnStats(f"n{t}_{c}", "numerical", lo, hi))
            else:
                vocab = int(rng.integers(2, 23))
                cols.append(ColumnStats(
                    f"c{t}_{c}", "categorical",
                    categories=tuple(range(vocab))))
        tables.append(TableStats(f"t{t}", tuple(cols),
                                 chunk_size=int(rng.integers(3, 9))))

    names = [t.table_name for t in tables]
    lines = []
    for i in range(120):
        k = int(rng.integers(1, n_tables + 1))
        used = sorted(rng.choice(n_tables, size=k, replace=False))
        tnames = ",".join(names[u] for u in used)
        preds = []
        for u in used:
            st = tables[u]
            parts = []
            for col in st.columns[1:]:
                if rng.random() < 0.5:
                    continue                     # unconstrained column
                if col.kind == "numerical":
                    hi = float(rng.uniform(col.min, col.max))
                    lo = float(rng.uniform(col.min, hi))
                    parts.append(f"{col.name},{hi:.6f},{lo:.6f}")
                else:
                    m = int(rng.integers(1, min(4, col.num_cat) + 1))
                    cats = ",".join(str(v) for v in sorted(
                        rng.choice(col.num_cat, size=m, replace=False)))
                    parts.append(f"{col.name},{cats}")
            preds.append("#".join(parts))
        joins = "#".join(
            f"{names[a]},{names[b]},id"
            for a, b in zip(used[:-1], used[1:])) if k > 1 else ""
        lines.append("@".join([tnames, *preds, joins, str(i + 1)]))

    enc_py = MultiJoinEncoder(tables)
    enc_c = native.FastEncoder(tables)
    x_c, cards_c, *_ = enc_c.encode_multi("\n".join(lines))
    parsed = [enc_py.parse_line(l) for l in lines]
    x_py = enc_py.encode_batch([(t, p, j) for (t, p, j, _) in parsed])
    np.testing.assert_array_equal(x_c, x_py)
    np.testing.assert_array_equal(cards_c, [c for (_, _, _, c) in parsed])


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_single_table_native_fuzz_random_schemas(seed):
    """Single-table parity on randomized schemas: random column mixes,
    ranges, vocab sizes, chunk widths, multi-category IN-sets."""
    rng = np.random.default_rng(seed)
    cols = []
    for c in range(int(rng.integers(2, 6))):
        if rng.random() < 0.5:
            lo = float(rng.uniform(-100, 50))
            hi = lo + float(rng.uniform(1e-3, 200))
            cols.append(ColumnStats(f"n{c}", "numerical", lo, hi))
        else:
            vocab = int(rng.integers(2, 23))
            cols.append(ColumnStats(f"c{c}", "categorical",
                                    categories=tuple(range(vocab))))
    st = TableStats("t0", tuple(cols), chunk_size=int(rng.integers(3, 9)))

    lines = []
    for i in range(80):
        parts = []
        for col in st.columns:
            if rng.random() < 0.4:
                continue
            if col.kind == "numerical":
                hi = float(rng.uniform(col.min, col.max))
                lo = float(rng.uniform(col.min, hi))
                parts.append(f"{col.name},{hi:.6f},{lo:.6f}")
            else:
                m = int(rng.integers(1, min(5, col.num_cat) + 1))
                cats = ",".join(str(v) for v in sorted(
                    rng.choice(col.num_cat, size=m, replace=False)))
                parts.append(f"{col.name},{cats}")
        if not parts:
            parts = [f"{st.columns[0].name}," + (
                f"{st.columns[0].max},{st.columns[0].min}"
                if st.columns[0].kind == "numerical" else "0")]
        lines.append("#".join(parts) + f"@{i + 1}")

    enc_c = native.FastEncoder([st])
    enc_py = SingleTableEncoder(st)
    x_c, cards, npd = enc_c.encode_single("\n".join(lines))
    parsed = [parse_single_table_line(l, st) for l in lines]
    x_py = enc_py.encode_batch([p for p, _ in parsed])
    np.testing.assert_array_equal(x_c, x_py)
    np.testing.assert_array_equal(cards, [c for _, c in parsed])


def test_chunk64_production_default_parity():
    """chunk_size=64 is the production default (stats.py): code 0 packs as
    +2^63 — a signed 1L<<63 shift produced -9.2e18 before. Also exercises
    fp64 rounding parity when bits beyond 53 combine."""
    st = TableStats("t", (
        ColumnStats("c", "categorical", categories=tuple(range(70))),),
        chunk_size=64)
    enc_py = SingleTableEncoder(st)
    enc_c = native.FastEncoder([st])
    lines = ["c,0@1", "c,63@2", "c,0,63,1@3", "c,64,69@4", "c,0,64@5"]
    x_c, cards, _ = enc_c.encode_single("\n".join(lines))
    parsed = [parse_single_table_line(l, st) for l in lines]
    x_py = enc_py.encode_batch([p for p, _ in parsed])
    np.testing.assert_array_equal(x_c, x_py)
    assert x_py[0][0] == 2.0 ** 63          # positive, not LLONG_MIN


def test_native_rejects_malformed_input_cleanly():
    """Untrusted serving lines must produce parse errors, not OOB writes,
    UB, or silent zeros: out-of-range / negative / garbage category codes,
    garbage numeric bounds, truncated join terms — with PHYSICAL line
    numbers in the error."""
    tables = _tables()
    enc = native.FastEncoder(tables)
    bad_lines = [
        "ta@tag,9999999@@1",          # out-of-range code (OOB write before)
        "ta@tag,-1@@1",               # negative code
        "ta@tag,1,@@1",               # trailing comma -> empty field
        "ta@tag,abc@@1",              # non-numeric code
        "ta@x,abc,def@@1",            # non-numeric bounds
        "ta,tb@@@ta,tb@1",            # join term missing the column field
    ]
    for line in bad_lines:
        with pytest.raises(ValueError, match="parse error"):
            enc.encode_multi(line)
    # physical line numbers: error after a blank line names the right line
    with pytest.raises(ValueError, match="line 3"):
        enc.encode_multi("ta@x,1.0,0.0@@1\n\nta@tag,9999999@@2")


def test_native_rejects_bad_cardinality_fields():
    """The card field is strictly parsed too: garbage must raise (a silent
    0.0 would later become a log2(0) = -inf label), and an overflowing
    numeric bound is rejected instead of becoming +/-inf."""
    tables = _tables()
    enc = native.FastEncoder(tables)
    for bad in ["ta@x,1.0,0.0@@abc",         # non-numeric card
                "ta@x,1.0,0.0@@",            # empty card
                "ta@x,1.0,0.0@@12x",         # trailing garbage
                "ta@x,1.0,0.0@@1e999999"]:   # overflow -> inf
        with pytest.raises(ValueError, match="parse error"):
            enc.encode_multi(bad)
    with pytest.raises(ValueError, match="parse error"):
        enc.encode_single("x,1.0,0.0@abc")
    with pytest.raises(ValueError, match="parse error"):
        enc.encode_multi("ta@x,1e999999,0.0@@1")  # overflowing bound
    # sanity: well-formed scientific-notation cards still parse
    _, cards, *_ = enc.encode_multi("ta@x,1.0,0.0@@1.5e3")
    np.testing.assert_array_equal(cards, [1500.0])


def test_native_accepts_subnormal_bounds():
    """Subnormal underflow (strtod sets ERANGE but returns a denormal)
    is a LEGITIMATE numeric value, not a parse error — only overflow to
    +/-inf must be rejected. The Python parser accepts 1e-310; the native
    encoder must agree (it encodes like 0.0 after range scaling)."""
    tables = _tables()
    enc = native.FastEncoder(tables)
    x_sub, cards, *_ = enc.encode_multi("ta@x,1e-310,0.0@@7")
    x_zero, _, *_ = enc.encode_multi("ta@x,0.0,0.0@@7")
    np.testing.assert_allclose(x_sub, x_zero, atol=1e-300)
    np.testing.assert_array_equal(cards, [7.0])
