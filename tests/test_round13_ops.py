"""Round-13: independent references for this round's changes. Each
test re-derives the expected answer from the raw sf0.001 parquet with
an INDEPENDENT formulation (numpy / plain-Python, no shared SQL
fragments) so a formula bug shared between the Spark build and the
DuckDB oracle cannot hide."""

import hashlib

import duckdb
import numpy as np

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _docs_py():
    return _fetch(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )


class TestMinhashMd5Twin:
    """Pure-Python re-derivation of the md5-based MinHash-LSH pair
    pipeline: shingles via str.split, base hash via hashlib.md5,
    permutation minima via numpy, band buckets via hashlib.md5 of the
    joined signature slice, candidate pairs via a dict of buckets,
    exact Jaccard via set intersection. No Spark expressions, no SQL."""

    def _expected(self):
        from finance_etl_spark.operators.dedup import (
            N_BANDS,
            N_PERM,
            ROWS_PER_BAND,
            _A,
            _B,
            _MERSENNE,
        )

        a = np.array(_A, dtype=np.int64)[:, None]
        b = np.array(_B, dtype=np.int64)[:, None]
        shingles, sigs = {}, {}
        for doc_id, text in _docs_py():
            toks = [t for t in text.split(" ") if t != ""]
            if len(toks) < 3:
                continue
            grams = list(
                dict.fromkeys(
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                )
            )
            shingles[doc_id] = set(grams)
            hs = np.array(
                [
                    int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    & 0x7FFFFFFF
                    for g in grams
                ],
                dtype=np.int64,
            )
            sigs[doc_id] = ((a * hs[None, :] + b) % _MERSENNE).min(axis=1)
        buckets = {}
        for doc_id, sig in sigs.items():
            for band in range(N_BANDS):
                sl = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                key = hashlib.md5(
                    "-".join(str(int(x)) for x in sl).encode()
                ).hexdigest()
                buckets.setdefault((band, key), []).append(doc_id)
        n_bands = {}
        for members in buckets.values():
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pair = (members[i], members[j])
                    n_bands[pair] = n_bands.get(pair, 0) + 1
        rows = []
        for (ia, ib), nb in n_bands.items():
            common = len(shingles[ia] & shingles[ib])
            if common == 0:
                continue
            jac = common / (len(shingles[ia]) + len(shingles[ib]) - common)
            if jac >= 0.5:
                rows.append((ia, ib, nb, common, jac))
        return sorted(rows)

    def test_matches_spark(self, spark):
        got = sorted(
            tuple(r)
            for r in plans.get("text_minhash_md5_twin").build(spark, SF).collect()
        )
        expected = self._expected()
        assert len(got) == len(expected) and len(got) > 0
        for g, e in zip(got, expected):
            assert g[:4] == e[:4]
            assert abs(g[4] - e[4]) < 1e-12

    def test_candidates_superset_intuition(self):
        """Every emitted pair shares at least one full band (n_bands
        >= 1) and at most all of them."""
        from finance_etl_spark.operators.dedup import N_BANDS

        for _, _, nb, _, _ in self._expected():
            assert 1 <= nb <= N_BANDS


class TestPQReplay:
    """Pure-numpy replay of the promoted vec_ann_pq_topk pipeline —
    md5-ordered sample, floor-quantized Lloyd codebooks, pinned-order
    folds, DIRECT per-pair ADC distances (no LUT gather — a different
    computation route than the Spark side), shortlist, exact-cosine
    re-rank — asserting the registered query's final output matches."""

    def _expected(self):
        M, DSUB, K, ITERS, SHORT, NSAMP = 16, 4, 16, 5, 50, 256
        rows = _fetch(
            f"SELECT vec_id, embedding FROM"
            f" read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
        )
        ids = np.array([r[0] for r in rows])
        V = np.array([r[1] for r in rows], dtype=np.float64)

        def norm_rows(W):
            acc = W[:, 0] * W[:, 0]
            for d in range(1, W.shape[1]):
                acc = acc + W[:, d] * W[:, d]
            return np.sqrt(acc)

        def d4(a, b):
            t = (a - b) ** 2
            return ((t[..., 0] + t[..., 1]) + t[..., 2]) + t[..., 3]

        N = V / norm_rows(V)[:, None]
        order = sorted(
            range(len(ids)),
            key=lambda i: (
                hashlib.md5(str(ids[i]).encode()).hexdigest(),
                ids[i],
            ),
        )
        X = N[order[:NSAMP]]
        books = []
        for j in range(M):
            sub = X[:, j * DSUB : (j + 1) * DSUB]
            cents = sub[:K].copy()
            for _ in range(ITERS):
                assign = d4(sub[:, None, :], cents[None, :, :]).argmin(
                    axis=1
                )
                new = cents.copy()
                for k in range(K):
                    pts = sub[assign == k]
                    if len(pts):
                        for r in range(DSUB):
                            new[k, r] = np.floor(pts[:, r] * 1e9).sum() / (
                                len(pts) * 1e9
                            )
                cents = new
            books.append(cents)
        B = np.stack(books)
        codes = np.empty((len(ids), M), dtype=np.int64)
        for j in range(M):
            codes[:, j] = d4(
                N[:, None, j * DSUB : (j + 1) * DSUB], B[j][None, :, :]
            ).argmin(axis=1)
        out = []
        for qi in np.where(ids < 5)[0]:
            q = N[qi]
            # direct route: adc(c) = fold_j d4(q_j, centroid[code_cj])
            adc = d4(
                q.reshape(M, DSUB)[0][None, :], B[0][codes[:, 0]]
            )
            for j in range(1, M):
                adc = adc + d4(
                    q.reshape(M, DSUB)[j][None, :], B[j][codes[:, j]]
                )
            cand = [
                (adc[ci], int(ids[ci]), ci)
                for ci in range(len(ids))
                if ids[ci] != ids[qi]
            ]
            cand.sort()
            short = cand[:SHORT]
            rescored = []
            for _, cid, ci in short:
                a, b = V[qi], V[ci]
                dot = a[0] * b[0]
                na, nb = a[0] * a[0], b[0] * b[0]
                for d in range(1, len(a)):
                    dot = dot + a[d] * b[d]
                    na = na + a[d] * a[d]
                    nb = nb + b[d] * b[d]
                rescored.append(
                    (-(dot / (np.sqrt(na) * np.sqrt(nb))), cid)
                )
            rescored.sort()
            for rank, (negcos, cid) in enumerate(rescored[:5], start=1):
                out.append((int(ids[qi]), cid, rank, -negcos))
        return sorted(out)

    def test_matches_spark(self, spark):
        got = sorted(
            tuple(r)
            for r in plans.get("vec_ann_pq_topk").build(spark, SF).collect()
        )
        expected = self._expected()
        assert len(got) == len(expected) == 25
        for g, e in zip(got, expected):
            assert g[:3] == e[:3]
            assert abs(g[3] - e[3]) < 1e-12


class TestBaggingOobV2:
    """Pure-Python re-derivation of ml_bagging_oob_v2 (the 2-digest
    md5 ladder): draws via hashlib slices, stumps via a dict-based
    histogram sweep, OOB census via per-key vote counting."""

    POIS = (24109, 48218, 60273, 64291, 65296, 65497, 65530, 65535)
    B = 16

    def _expected(self):
        rows = _fetch(
            "SELECT l_orderkey, l_linenumber, l_partkey,"
            " CAST(l_extendedprice AS DOUBLE), l_returnflag"
            f" FROM read_parquet('{SF}/lineitem.parquet')"
        )
        xs = [r[3] for r in rows]
        xmin, xmax = min(xs), max(xs)
        base = {}
        for ok, ln, pk, x, rf in rows:
            b = min(31, int(np.floor((x - xmin) / ((xmax - xmin) / 32.0))))
            key = (f"{ok}-{ln}-{pk}", b, 1 if rf == "R" else 0)
            base[key] = base.get(key, 0) + 1

        def w_of(k, b):
            dig = hashlib.md5(f"{k}#{b // 8}".encode()).hexdigest()
            u = int(dig[4 * (b % 8) : 4 * (b % 8) + 4], 16)
            for w, t in enumerate(self.POIS):
                if u < t:
                    return w
            return len(self.POIS)

        weights = {
            (k, b): w_of(k[0], b) for k in base for b in range(self.B)
        }
        stumps = {}
        for b in range(self.B):
            hist = {}
            for (k, bn, y), cnt in base.items():
                w = weights[((k, bn, y), b)]
                n, p = hist.get(bn, (0, 0))
                hist[bn] = (n + w * cnt, p + w * cnt * y)
            bins = sorted(hist)
            tot_n = sum(n for n, _ in hist.values())
            tot_p = sum(p for _, p in hist.values())
            cands = []
            cum_n = cum_p = 0
            for bn in bins:
                cum_n += hist[bn][0]
                cum_p += hist[bn][1]
                if cum_n >= tot_n:
                    continue
                wrong_lp = (cum_n - cum_p) + (tot_p - cum_p)
                wrong_ln = cum_p + (tot_n - cum_n) - (tot_p - cum_p)
                cands.append((wrong_ln, bn, "left_neg"))
                cands.append((wrong_lp, bn, "left_pos"))
            cands.sort()
            stumps[b] = cands[0]
        n_oob_rows = n_err = 0
        for (k, bn, y), cnt in base.items():
            n_oob = votes = 0
            for b in range(self.B):
                if weights[((k, bn, y), b)] != 0:
                    continue
                n_oob += 1
                _, sb, pol = stumps[b]
                if (bn <= sb) == (pol == "left_pos"):
                    votes += 1
            if n_oob > 0:
                pred = 1 if 2 * votes > n_oob else 0
                n_oob_rows += cnt
                if pred != y:
                    n_err += cnt
        return {
            b: (stumps[b][1], stumps[b][2], stumps[b][0], n_oob_rows,
                n_err / n_oob_rows)
            for b in range(self.B)
        }

    def test_matches_spark(self, spark):
        got = {
            r.b: (r.split_bin, r.polarity, r.weighted_wrong, r.n_oob_rows,
                  r.oob_error)
            for r in plans.get("ml_bagging_oob_v2").build(spark, SF).collect()
        }
        expected = self._expected()
        assert set(got) == set(range(self.B))
        for b in range(self.B):
            assert got[b][:4] == expected[b][:4], (b, got[b], expected[b])
            assert abs(got[b][4] - expected[b][4]) < 1e-12

    def test_draws_differ_from_v1(self, spark):
        """The slicing is NOT a drop-in: at least one stump differs
        from v1's on the fixture (guards against silently aliasing
        the two ladders)."""
        v1 = {
            r.b: (r.split_bin, r.polarity, r.weighted_wrong)
            for r in plans.get("ml_bagging_oob").build(spark, SF).collect()
        }
        v2 = {
            r.b: (r.split_bin, r.polarity, r.weighted_wrong)
            for r in plans.get("ml_bagging_oob_v2").build(spark, SF).collect()
        }
        assert v1 != v2
