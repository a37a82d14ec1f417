"""Pallas kernels vs the jnp reference ops (interpreter mode on CPU)."""

import numpy as np
import pytest

from kmers_tpu.ops import u64
from kmers_tpu.ops.encode import classify_2bit, pack_words
from kmers_tpu.ops.windows import canonical_windows_from_codes
from kmers_tpu.ops.pallas.window_kernel import (
    HAVE_PALLAS,
    canonical_windows_pallas,
    linearize_offset_major,
)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")


def _codes(rng, n):
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    c, _, _ = classify_2bit(np.frombuffer(s.encode(), np.uint8))
    return np.asarray(c)


class TestCanonicalWindowKernel:
    @pytest.mark.parametrize("K", [1, 7, 16, 31, 32])
    def test_parity(self, rng, K):
        codes = _codes(rng, 20000)
        words = pack_words(codes, bps=2, pad_words=2)
        hi, lo = canonical_windows_pallas(
            np.asarray(words), K, W=256, interpret=True
        )
        n = codes.shape[0] - K + 1
        got = u64.to_numpy(
            (linearize_offset_major(hi, n), linearize_offset_major(lo, n))
        )
        want = u64.to_numpy(canonical_windows_from_codes(codes, K))
        assert np.array_equal(got, want)

    def test_non_multiple_tile(self, rng):
        # word count not a multiple of W
        codes = _codes(rng, 16 * 300 + 5)
        words = pack_words(codes, bps=2, pad_words=2)
        hi, lo = canonical_windows_pallas(
            np.asarray(words), 31, W=128, interpret=True
        )
        n = codes.shape[0] - 31 + 1
        got = u64.to_numpy(
            (linearize_offset_major(hi, n), linearize_offset_major(lo, n))
        )
        want = u64.to_numpy(canonical_windows_from_codes(codes, 31))
        assert np.array_equal(got, want)

    def test_bad_k(self):
        with pytest.raises(ValueError):
            canonical_windows_pallas(np.zeros(64, np.uint32), 33)


class TestMaskedKernel:
    @pytest.mark.parametrize("K", [5, 31])
    def test_sentinel_masking(self, rng, K):
        from kmers_tpu.ops.pallas.window_kernel import canonical_windows_masked_pallas
        from kmers_tpu.ops.windows import canonical_windows_from_codes, window_valid_mask

        s = "".join("ACGTN"[i] for i in rng.integers(0, 5, 5000))
        codes, certain, _ = classify_2bit(np.frombuffer(s.encode(), np.uint8))
        hi_om, lo_om = canonical_windows_masked_pallas(
            np.asarray(codes), np.asarray(certain), K, W=128, interpret=True
        )
        n = len(s) - K + 1
        hi = np.asarray(linearize_offset_major(hi_om, n))
        lo = np.asarray(linearize_offset_major(lo_om, n))
        want_hi, want_lo = (
            np.asarray(x)
            for x in canonical_windows_from_codes(np.asarray(codes), K)
        )
        valid = np.asarray(window_valid_mask(np.asarray(certain), K))
        assert np.array_equal(hi[valid], want_hi[valid])
        assert np.array_equal(lo[valid], want_lo[valid])
        assert (hi[~valid] == 0xFFFFFFFF).all() and (lo[~valid] == 0xFFFFFFFF).all()
        # padding slots beyond n are sentinel too
        flat_hi = np.asarray(hi_om).T.reshape(-1)
        assert (flat_hi[n:] == 0xFFFFFFFF).all()


class TestFusedBytesKernel:
    """The fully fused front-end (bytes -> classify -> pack -> canonical
    windows / hashes in one kernel) must match the masked kernel fed by
    the XLA classify+pack front-end bit-for-bit."""

    @pytest.mark.parametrize("K", [1, 5, 31])
    @pytest.mark.parametrize("L", [1, 17, 1000, 5003])
    def test_windows_and_hash_parity(self, rng, K, L):
        from kmers_tpu.ops.pallas.window_kernel import (
            canonical_hash_bytes_pallas,
            canonical_hash_masked_pallas,
            canonical_windows_bytes_pallas,
            canonical_windows_masked_pallas,
        )

        if K > L:
            pytest.skip("window longer than input")
        # mixed certain/ambiguous/invalid bytes, both cases
        pool = np.frombuffer(b"ACGTNacgtu-X", dtype=np.uint8)
        b = pool[rng.integers(0, len(pool), L)]
        codes, certain, _ = classify_2bit(b)
        h0, l0 = canonical_windows_masked_pallas(
            np.asarray(codes), np.asarray(certain), K, W=128, interpret=True
        )
        h1, l1 = canonical_windows_bytes_pallas(b, K, W=128, interpret=True)
        n = h0.shape[1]
        assert np.array_equal(np.asarray(h0), np.asarray(h1)[:, :n])
        assert np.array_equal(np.asarray(l0), np.asarray(l1)[:, :n])
        # the wider byte-kernel tail (covers L/16 vs (L-K+1)/16 word
        # columns) must be all-sentinel
        assert (np.asarray(h1)[:, n:] == 0xFFFFFFFF).all()
        hh0, hl0 = canonical_hash_masked_pallas(
            np.asarray(codes), np.asarray(certain), K, W=128, interpret=True
        )
        hh1, hl1 = canonical_hash_bytes_pallas(b, K, W=128, interpret=True)
        assert np.array_equal(np.asarray(hh0), np.asarray(hh1)[:, :n])
        assert np.array_equal(np.asarray(hl0), np.asarray(hl1)[:, :n])

    def test_bad_k(self):
        from kmers_tpu.ops.pallas.window_kernel import (
            canonical_windows_bytes_pallas,
        )

        with pytest.raises(ValueError):
            canonical_windows_bytes_pallas(np.zeros(64, np.uint8), 32)

    @pytest.mark.parametrize("K", [1, 5, 31])
    @pytest.mark.parametrize("L", [1, 17, 1000, 5003])
    def test_u32_variant_parity(self, rng, K, L):
        """The transpose-free u32 front-end must hold the same window
        multiset as the byte kernel (flat index 4*(tile*V+j)+t lands at
        tile*4V + t*V + j) and reproduce the error counters."""
        from kmers_tpu.ops.pallas.window_kernel import (
            canonical_windows_bytes_pallas,
            canonical_windows_u32_pallas,
        )

        if K > L:
            pytest.skip("window longer than input")
        V = 128
        pool = np.frombuffer(b"ACGTNacgtu-X", dtype=np.uint8)
        b = pool[rng.integers(0, len(pool), L)]
        pad = (-L) % (4 * V)
        padded = np.concatenate([b, np.full(pad, ord("N"), np.uint8)])
        v = padded.view("<u4")
        h1, l1, n_bad, n_amb = canonical_windows_u32_pallas(
            v, K, V=V, interpret=True
        )
        h0, l0 = canonical_windows_bytes_pallas(b, K, W=128, interpret=True)
        v0 = (np.asarray(h0).astype(np.uint64) << 32) | np.asarray(l0).astype(
            np.uint64
        )
        v1 = (np.asarray(h1).astype(np.uint64) << 32) | np.asarray(l1).astype(
            np.uint64
        )
        SENT64 = (0xFFFFFFFF << 32) | 0xFFFFFFFF
        real0 = np.sort(v0.reshape(-1)[v0.reshape(-1) != SENT64])
        real1 = np.sort(v1[v1 != SENT64])
        assert np.array_equal(real0, real1)
        # exact relabeling: global position p = 4*(tile*V + j) + t
        n_pos = padded.shape[0]
        flat = np.full(v1.shape, SENT64, np.uint64)
        v0_lin = np.zeros(n_pos, np.uint64)
        # linearize the byte kernel's offset-major (r, q): position 16q+r
        Q0 = v0.shape[1]
        for r in range(16):
            for q in range(Q0):
                p = 16 * q + r
                if p < n_pos:
                    v0_lin[p] = v0[r, q]
        for p in range(n_pos):
            tile, rem = divmod(p, 4 * V)
            j, t = divmod(rem, 4)
            want = v0_lin[p] if p < 16 * Q0 else SENT64
            flat[tile * 4 * V + t * V + j] = want
        assert np.array_equal(flat, v1)
        _, certain, ambig = classify_2bit(padded)
        invalid = ~(np.asarray(certain) | np.asarray(ambig))
        assert int(n_bad) == int(invalid.sum())
        assert int(n_amb) == int(np.asarray(ambig).sum())

    @pytest.mark.parametrize("K", [1, 5, 31])
    @pytest.mark.parametrize("L", [1, 17, 1000, 5003])
    def test_flat_variant_parity(self, rng, K, L):
        """The flat-output + fused-counters kernel must hold the same
        window multiset as the (16, Q) kernel (flat index tile*16W + r*W
        + q is a bijective relabeling of offset-major (r, tile*W + q))
        and reproduce classify_2bit's error counters exactly."""
        from kmers_tpu.ops.pallas.window_kernel import (
            canonical_windows_bytes_flat_pallas,
            canonical_windows_bytes_pallas,
        )

        if K > L:
            pytest.skip("window longer than input")
        pool = np.frombuffer(b"ACGTNacgtu-X", dtype=np.uint8)
        b = pool[rng.integers(0, len(pool), L)]
        h0, l0 = canonical_windows_bytes_pallas(b, K, W=128, interpret=True)
        h1, l1, n_bad, n_amb = canonical_windows_bytes_flat_pallas(
            b, K, W=128, interpret=True
        )
        v0 = (np.asarray(h0).astype(np.uint64) << 32) | np.asarray(l0).astype(np.uint64)
        v1 = (np.asarray(h1).astype(np.uint64) << 32) | np.asarray(l1).astype(np.uint64)
        assert np.array_equal(np.sort(v0.reshape(-1)), np.sort(v1))
        # exact relabeling check: (r, q) -> tile*16W + r*W + q
        W = 128
        Q = v0.shape[1]
        flat = np.full(v1.shape, 0, np.uint64)
        for r in range(16):
            for q in range(Q):
                tile, qq = divmod(q, W)
                flat[tile * 16 * W + r * W + qq] = v0[r, q]
        assert np.array_equal(flat, v1)
        _, certain, ambig = classify_2bit(b)
        invalid = ~(np.asarray(certain) | np.asarray(ambig))
        assert int(n_bad) == int(invalid.sum())
        assert int(n_amb) == int(np.asarray(ambig).sum())


class TestGeneralKernel:
    @pytest.mark.parametrize("bps,K,canonical", [
        (2, 31, True), (2, 16, False), (4, 15, True), (4, 9, False), (8, 7, False),
    ])
    def test_parity(self, rng, bps, K, canonical):
        from kmers_tpu import DNAAlphabet4, AminoAcidAlphabet
        from kmers_tpu.ops import u64 as u64ops
        from kmers_tpu.ops.encode import encode_table
        from kmers_tpu.ops.pallas.general_kernel import windows_pallas_general
        from kmers_tpu.ops.windows import (
            canonical_windows_4bit_from_codes,
            canonical_windows_from_codes,
            window_valid_mask,
            windows_from_codes,
        )

        if bps == 2:
            s = "".join("ACGTN"[i] for i in rng.integers(0, 5, 4000))
            codes, good, _ = classify_2bit(np.frombuffer(s.encode(), np.uint8))
            want = (
                canonical_windows_from_codes(np.asarray(codes), K)
                if canonical
                else windows_from_codes(np.asarray(codes), K)
            )
        elif bps == 4:
            s = "".join("ACGTMRN"[i] for i in rng.integers(0, 7, 3000))
            codes, good = encode_table(
                np.frombuffer(s.encode(), np.uint8), DNAAlphabet4
            )
            want = (
                canonical_windows_4bit_from_codes(np.asarray(codes), K)
                if canonical
                else windows_from_codes(np.asarray(codes), K, bps=4)
            )
        else:
            s = "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, 2000))
            codes, good = encode_table(
                np.frombuffer(s.encode(), np.uint8), AminoAcidAlphabet
            )
            want = windows_from_codes(np.asarray(codes), K, bps=8)

        hi_om, lo_om = windows_pallas_general(
            np.asarray(codes), np.asarray(good), K, bps=bps,
            canonical=canonical, W=128, interpret=True,
        )
        n = len(s) - K + 1
        got_hi = np.asarray(linearize_offset_major(hi_om, n))
        got_lo = np.asarray(linearize_offset_major(lo_om, n))
        valid = np.asarray(window_valid_mask(np.asarray(good), K))
        wh, wl = (np.asarray(x) for x in want)
        assert np.array_equal(got_hi[valid], wh[valid])
        assert np.array_equal(got_lo[valid], wl[valid])
        assert (got_hi[~valid] == 0xFFFFFFFF).all()


class TestHashKernel:
    @pytest.mark.parametrize("K", [7, 31])
    def test_fused_hash_parity(self, rng, K):
        from kmers_tpu.ops.hashing import fx_hash_u64
        from kmers_tpu.ops.pallas.window_kernel import canonical_hash_masked_pallas
        from kmers_tpu.ops.windows import (
            canonical_windows_from_codes,
            window_valid_mask,
        )

        s = "".join("ACGTN"[i] for i in rng.integers(0, 5, 5000))
        codes, certain, _ = classify_2bit(np.frombuffer(s.encode(), np.uint8))
        hh_om, hl_om = canonical_hash_masked_pallas(
            np.asarray(codes), np.asarray(certain), K, W=128, interpret=True
        )
        n = len(s) - K + 1
        hh = np.asarray(linearize_offset_major(hh_om, n))
        hl = np.asarray(linearize_offset_major(hl_om, n))
        chi, clo = canonical_windows_from_codes(np.asarray(codes), K)
        want_h, want_l = (np.asarray(x) for x in fx_hash_u64(chi, clo))
        valid = np.asarray(window_valid_mask(np.asarray(certain), K))
        assert np.array_equal(hh[valid], want_h[valid])
        assert np.array_equal(hl[valid], want_l[valid])
        assert (hh[~valid] == 0xFFFFFFFF).all() and (hl[~valid] == 0xFFFFFFFF).all()


class TestRleKernel:
    @staticmethod
    def _check(hi, lo, W=256):
        import jax.numpy as jnp
        from jax import lax

        from kmers_tpu.ops.count import _run_length_encode
        from kmers_tpu.ops.pallas.rle_kernel import rle_unit_pallas

        shi, slo = lax.sort(
            (jnp.asarray(hi), jnp.asarray(lo)), num_keys=2, is_stable=False
        )
        want = _run_length_encode(shi, slo)
        got = rle_unit_pallas(shi, slo, W=W, interpret=True)
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))

    def test_random_duplicates(self, rng):
        n = 5000
        hi = rng.integers(0, 50, n).astype(np.uint32)
        lo = rng.integers(0, 4, n).astype(np.uint32)
        self._check(hi, lo)

    def test_with_sentinel_tail(self, rng):
        n = 3000
        hi = rng.integers(0, 20, n).astype(np.uint32)
        lo = rng.integers(0, 3, n).astype(np.uint32)
        sent = np.uint32(0xFFFFFFFF)
        hi[-100:] = sent
        lo[-100:] = sent
        self._check(hi, lo)

    def test_all_unique(self, rng):
        n = 1000
        hi = np.arange(n, dtype=np.uint32)
        lo = np.arange(n, dtype=np.uint32)
        self._check(hi, lo)

    def test_single_run_spanning_blocks(self):
        # one run longer than several W=256 blocks: exercises the
        # cross-block run-start and last-key carries
        n = 2000
        hi = np.zeros(n, np.uint32)
        lo = np.zeros(n, np.uint32)
        self._check(hi, lo)

    def test_run_boundary_at_block_edge(self):
        # runs switching exactly at multiples of W
        W = 256
        hi = np.repeat(np.arange(8, dtype=np.uint32), W)
        lo = np.zeros(8 * W, np.uint32)
        self._check(hi, lo, W=W)

    def test_tile_aligned_zero_copy(self, rng):
        # n == grid * 8W exactly: the zero-copy reshape path, with runs
        # crossing row and tile boundaries
        W = 128
        n = 3 * 8 * W
        hi = np.sort(rng.integers(0, 40, n).astype(np.uint32))
        lo = np.zeros(n, np.uint32)
        self._check(hi, lo, W=W)

    def test_row_boundary_runs(self):
        # runs switching exactly at row boundaries (multiples of W inside
        # a tile) — exercises the sublane-roll prev/next paths
        W = 128
        hi = np.repeat(np.arange(16, dtype=np.uint32), W)
        lo = np.zeros(16 * W, np.uint32)
        self._check(hi, lo, W=W)

    def test_length_not_multiple_of_w(self, rng):
        n = 777
        hi = rng.integers(0, 9, n).astype(np.uint32)
        lo = rng.integers(0, 2, n).astype(np.uint32)
        self._check(hi, lo)

    def test_empty(self):
        from kmers_tpu.ops.pallas.rle_kernel import rle_unit_pallas

        uh, ul, cnt, nu = rle_unit_pallas(
            np.zeros(0, np.uint32), np.zeros(0, np.uint32), interpret=True
        )
        assert uh.size == 0 and int(nu) == 0

    def test_sort_count_use_pallas_interpret(self, rng):
        from kmers_tpu.ops.count import sort_count

        n = 4096
        hi = rng.integers(0, 30, n).astype(np.uint32)
        lo = rng.integers(0, 2, n).astype(np.uint32)
        valid = rng.random(n) < 0.9
        import jax.numpy as jnp

        a = sort_count(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(valid))
        b = sort_count(
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(valid),
            use_pallas=True,
            interpret=True,
        )
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


class TestBitonicMergeKernel:
    @staticmethod
    def _jnp_tail_reference(xh, xl, xc, max_d):
        # the jnp compare-exchange passes of merge_compact_tables for
        # strides max_d down to 1
        import jax.numpy as jnp

        xh, xl, xc = jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(xc)
        d = max_d
        while d >= 1:
            h2 = xh.reshape(-1, 2, d)
            l2 = xl.reshape(-1, 2, d)
            c2 = xc.reshape(-1, 2, d)
            th, bh = h2[:, 0], h2[:, 1]
            tl, bl = l2[:, 0], l2[:, 1]
            tc, bc = c2[:, 0], c2[:, 1]
            le = (th < bh) | ((th == bh) & (tl <= bl))
            xh = jnp.stack([jnp.where(le, th, bh), jnp.where(le, bh, th)], 1).reshape(-1)
            xl = jnp.stack([jnp.where(le, tl, bl), jnp.where(le, bl, tl)], 1).reshape(-1)
            xc = jnp.stack([jnp.where(le, tc, bc), jnp.where(le, bc, tc)], 1).reshape(-1)
            d //= 2
        return np.asarray(xh), np.asarray(xl), np.asarray(xc)

    @pytest.mark.parametrize("tiles", [1, 2])
    def test_tail_matches_jnp_passes(self, rng, tiles):
        from kmers_tpu.ops.pallas.merge_kernel import bitonic_merge_tail_pallas

        W = 128
        n = tiles * 8 * W
        hi = rng.integers(0, 50, n).astype(np.uint32)
        lo = rng.integers(0, 1 << 16, n).astype(np.uint32)
        cnt = rng.integers(0, 100, n).astype(np.int32)
        oh, ol, oc = bitonic_merge_tail_pallas(hi, lo, cnt, W=W, interpret=True)
        wh, wl, wc = self._jnp_tail_reference(hi, lo, cnt, 4 * W)
        assert np.array_equal(np.asarray(oh), wh)
        assert np.array_equal(np.asarray(ol), wl)
        assert np.array_equal(np.asarray(oc), wc)

    def test_full_merge_equivalence(self, rng):
        # merge_compact_tables with the fused Mosaic tail (interpreter
        # mode) must produce the same table as the pure-jnp network; the
        # input is sized so 2 * half == 8 * 4096 and the fused branch
        # genuinely runs
        import jax.numpy as jnp
        from kmers_tpu.ops.count import compact_counts, merge_compact_tables, sort_count

        def mk(n):
            hi = rng.integers(0, 5000, n).astype(np.uint32)
            lo = rng.integers(0, 1 << 12, n).astype(np.uint32)
            t = sort_count(jnp.asarray(hi), jnp.asarray(lo))
            uh, ul, c = compact_counts(t[0], t[1], t[2])
            return uh, ul, c

        ah, al, ac = mk(16384)
        bh, bl, bc = mk(16384)
        ref = merge_compact_tables(ah, al, ac, bh, bl, bc, use_pallas=False)
        got = merge_compact_tables(
            ah, al, ac, bh, bl, bc, use_pallas=True, tail_interpret=True
        )
        for x, y in zip(ref, got):
            assert np.array_equal(np.asarray(x), np.asarray(y))


class TestBitonicSortKernel:
    @pytest.mark.parametrize("tiles", [1, 2, 8])
    def test_matches_lax_sort(self, rng, tiles):
        import jax.numpy as jnp
        from jax import lax
        from kmers_tpu.ops.pallas.sort_kernel import bitonic_sort_pallas

        W = 128
        n = tiles * 8 * W
        hi = rng.integers(0, 50, n).astype(np.uint32)
        lo = rng.integers(0, 1 << 16, n).astype(np.uint32)
        sh, sl = bitonic_sort_pallas(
            jnp.asarray(hi), jnp.asarray(lo), W=W, interpret=True
        )
        wh, wl = lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
        assert np.array_equal(np.asarray(sh), np.asarray(wh))
        assert np.array_equal(np.asarray(sl), np.asarray(wl))

    def test_with_sentinels(self, rng):
        # sentinel-padded streams (the sort_count input contract)
        import jax.numpy as jnp
        from jax import lax
        from kmers_tpu.ops.pallas.sort_kernel import bitonic_sort_pallas

        W = 128
        n = 2 * 8 * W
        hi = rng.integers(0, 10, n).astype(np.uint32)
        lo = rng.integers(0, 4, n).astype(np.uint32)
        mask = rng.random(n) < 0.3
        hi[mask] = 0xFFFFFFFF
        lo[mask] = 0xFFFFFFFF
        sh, sl = bitonic_sort_pallas(
            jnp.asarray(hi), jnp.asarray(lo), W=W, interpret=True
        )
        wh, wl = lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
        assert np.array_equal(np.asarray(sh), np.asarray(wh))
        assert np.array_equal(np.asarray(sl), np.asarray(wl))


class TestCompactTailKernel:
    def test_matches_jnp_passes(self, rng):
        import jax.numpy as jnp
        from kmers_tpu.ops.count import compact_counts, sort_count
        from kmers_tpu.ops.pallas.merge_kernel import compact_tail_pallas

        W = 128
        n = 2 * 8 * W
        hi = rng.integers(0, 60, n).astype(np.uint32)
        lo = rng.integers(0, 8, n).astype(np.uint32)
        uh, ul, cnt, _ = sort_count(jnp.asarray(hi), jnp.asarray(lo))
        # reference: the pure-jnp network
        wh, wl, wc = compact_counts(uh, ul, cnt, use_pallas=False)
        # kernel: fused in-tile passes + the remaining jnp passes, by
        # replaying compact_counts' tail manually
        real = np.asarray(cnt) > 0
        nreal = (~real).astype(np.int32)
        d = np.cumsum(nreal) - nreal
        oh, ol, oc, d2, v2 = compact_tail_pallas(
            uh, ul, jnp.asarray(np.asarray(cnt), jnp.int32),
            jnp.asarray(d, jnp.int32),
            jnp.asarray(real.astype(np.int32)),
            W=W, interpret=True,
        )
        oh, ol, oc = np.asarray(oh), np.asarray(ol), np.asarray(oc)
        d2, v2 = np.asarray(d2), np.asarray(v2).astype(bool)
        k = (8 * W).bit_length() - 1
        while (1 << k) < n:
            s = 1 << k

            def sh(a):
                return np.concatenate([a[s:], np.zeros(s, a.dtype)])

            d_in = sh(d2)
            v_in = sh(v2.astype(np.int8)).astype(bool)
            take = v_in & (((d_in >> k) & 1) == 1)
            stay = v2 & (((d2 >> k) & 1) == 0)
            oh = np.where(take, sh(oh), np.where(stay, oh, 0))
            ol = np.where(take, sh(ol), np.where(stay, ol, 0))
            oc = np.where(take, sh(oc), np.where(stay, oc, 0))
            d2 = np.where(take, d_in, d2)
            v2 = take | stay
            k += 1
        sent = np.uint32(0xFFFFFFFF)
        got_h = np.where(v2, oh, sent)
        got_l = np.where(v2, ol, sent)
        got_c = np.where(v2, oc, 0)
        assert np.array_equal(got_h, np.asarray(wh))
        assert np.array_equal(got_l, np.asarray(wl))
        assert np.array_equal(got_c, np.asarray(wc))


class TestSixFrameFusedKernel:
    """Fused six-frame AA window kernel vs the jnp front-end (multiset
    parity of non-sentinel windows + valid-window count)."""

    @pytest.mark.parametrize("K,p3", [(1, 0), (3, 6), (5, 0), (7, 6)])
    def test_parity_vs_jnp_fe(self, rng, K, p3):
        from collections import Counter

        import jax.numpy as jnp

        from kmers_tpu.genetic_codes import standard_genetic_code
        from kmers_tpu.ops.count import SENTINEL
        from kmers_tpu.ops.pallas.sixframe_kernel import (
            sixframe_tbl16,
            sixframe_windows_u32_pallas,
        )
        from kmers_tpu.parallel.sixframe import _sixframe_fe_body

        tbl = np.asarray(standard_genetic_code.tbl)
        tbl16 = sixframe_tbl16(bytes(tbl.tobytes()))
        V = 256
        row4 = 4 * V * 2  # two tiles
        H = 3 * K
        B = row4 - 2 * H - 24
        B -= B % 3
        row_len = B + 2 * H
        b_true = B - p3
        s = rng.choice(
            np.frombuffer(b"ACGTNacgt!", np.uint8),
            size=row_len,
            p=[0.2, 0.2, 0.2, 0.2, 0.05, 0.04, 0.04, 0.04, 0.025, 0.005],
        ).astype(np.uint8)
        if p3:
            s[H + b_true :] = 0
        hi_j, lo_j, nv_j = _sixframe_fe_body(
            s[None], np.asarray([p3], np.int32), K=K, tbl=tbl
        )
        hi_j, lo_j = np.asarray(hi_j), np.asarray(lo_j)
        m = (hi_j != SENTINEL) | (lo_j != SENTINEL)
        want = Counter(zip(hi_j[m].tolist(), lo_j[m].tolist()))

        row = np.zeros(row4, np.uint8)
        row[:row_len] = s
        bounds = np.zeros(128, np.int32)
        bounds[:4] = (H, H + b_true, 1, b_true + 1)
        hi_k, lo_k, nv_k = sixframe_windows_u32_pallas(
            jnp.asarray(row.view("<u4")),
            jnp.asarray(bounds),
            K,
            V=V,
            interpret=True,
            tbl16=tbl16,
        )
        hi_k, lo_k = np.asarray(hi_k), np.asarray(lo_k)
        mk = (hi_k != SENTINEL) | (lo_k != SENTINEL)
        got = Counter(zip(hi_k[mk].tolist(), lo_k[mk].tolist()))
        assert got == want
        assert int(nv_k) == int(nv_j[0]) == int(mk.sum())
