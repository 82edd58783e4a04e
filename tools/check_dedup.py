#!/usr/bin/env python3
"""Hard correctness gate for the near-dup pipelines (d02/d03/d04).

These operators have no SQL oracle (LSH/minhash internals), so this
gate re-verifies their OUTPUT against an independent Python
re-implementation of the exact similarity metrics, over the same
parquet the driver uses:

  d04 (LSH->exact jaccard):
    - soundness: every emitted (id_a, id_b, jaccard) must equal the
      true word-3-gram jaccard of the two representative texts
      (hashed-gram comparison is claimed collision-free — prove it)
    - recall: every true pair with jaccard >= 0.5 must be emitted
  d02 (minhash est_jaccard): emitted estimates track the true byte
      5-shingle jaccard (mean |est-true| bounded; minhash with 64
      permutations has sigma ~ 0.06, bound at 0.2)
  d03 (simhash hamming<=3): emitted pairs are mostly true near-dups
      (simhash admits rare structural false positives by design —
      bound the rate instead of forbidding it)

Usage: python3 tools/check_dedup.py <sfDir> <verifyOutDir>
"""
import itertools
import statistics
import sys

import pyarrow.parquet as pq


def ascii_lower_tokens(s):
    out, cur = [], []
    for ch in s:
        if ch in " \t\n\r":
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch.lower() if "A" <= ch <= "Z" else ch)
    if cur:
        out.append("".join(cur))
    return out


def word_ngrams(toks, n=3):
    if not toks:
        return set()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def byte_shingles(s, k=5):
    b = s.encode("utf-8")  # kernel shingles BYTES, not code points
    if len(b) <= k:
        return {bytes(b)}
    return {bytes(b[i:i + k]) for i in range(len(b) - k + 1)}


def jacc(a, b):
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / max(len(a) + len(b) - inter, 1)


def main(sf_dir, out_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    rep = {}
    for d in docs:
        t = d["text"]
        if t not in rep or d["doc_id"] < rep[t]:
            rep[t] = d["doc_id"]
    reps = {v: k for k, v in rep.items()}
    grams = {i: word_ngrams(ascii_lower_tokens(t)) for i, t in reps.items()}
    shingles = {i: byte_shingles(t) for i, t in reps.items()}
    failures = []

    # ---- d04: soundness + recall ----
    d04 = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in pq.read_table(f"{out_dir}/d04_ngram_jaccard").to_pylist()}
    unsound = sum(
        1 for (a, b), j in d04.items()
        if abs(jacc(grams[a], grams[b]) - j) > 1e-9)
    if unsound:
        failures.append(f"d04 soundness: {unsound}/{len(d04)} pairs disagree "
                        "with true jaccard")
    true_pairs = [
        (a, b) for a, b in itertools.combinations(sorted(grams), 2)
        if jacc(grams[a], grams[b]) >= 0.5]
    hit = sum(1 for p in true_pairs if p in d04)
    recall = hit / len(true_pairs) if true_pairs else 1.0
    if recall < 0.9:
        failures.append(f"d04 recall@j>=0.5: {hit}/{len(true_pairs)}")
    print(f"d04: {len(d04)} pairs, soundness violations={unsound}, "
          f"recall@0.5={hit}/{len(true_pairs)}")

    # ---- d02: estimator accuracy ----
    d02 = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in pq.read_table(f"{out_dir}/d02_dedup_minhash").to_pylist()}
    errs = [abs(jacc(shingles[a], shingles[b]) - ej)
            for (a, b), ej in d02.items()]
    mean_err = statistics.mean(errs) if errs else 0.0
    if not d02:
        failures.append("d02 emitted no pairs")
    if mean_err > 0.2:
        failures.append(f"d02 mean |est-true|={mean_err:.3f} > 0.2")
    print(f"d02: {len(d02)} pairs, mean |est-true|={mean_err:.4f}, "
          f"max={max(errs):.4f}" if errs else "d02: 0 pairs")

    # ---- d03: near-dup precision (simhash admits rare FPs) ----
    d03 = pq.read_table(f"{out_dir}/d03_dedup_simhash").to_pylist()
    tj = [jacc(grams[r["id_a"]], grams[r["id_b"]]) for r in d03]
    good = sum(1 for j in tj if j >= 0.3)
    prec = good / len(tj) if tj else 1.0
    if not d03:
        failures.append("d03 emitted no pairs")
    if prec < 0.8:
        failures.append(f"d03 precision@j>=0.3: {good}/{len(tj)}")
    print(f"d03: {len(d03)} pairs, precision@j>=0.3={good}/{len(tj)}")

    # ---- d06: clusters == union-find over the verified pair graph ----
    # independent transitive-closure check: the emitted (id, label)
    # assignment must exactly equal Python union-find over the d04
    # pairs with jaccard >= 0.5 (labels are min-reachable-id)
    import os
    if os.path.isdir(f"{out_dir}/d06_dedup_clusters"):
        edges = [(a, b) for (a, b), j in d04.items() if j >= 0.5]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        got = {r["id"]: r["label"]
               for r in pq.read_table(f"{out_dir}/d06_dedup_clusters").to_pylist()}
        if got != want:
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            failures.append(f"d06 clusters differ from union-find on "
                            f"{len(bad)} nodes (e.g. {sorted(bad)[:5]})")
        n_clusters = len(set(want.values()))
        print(f"d06: {len(got)} nodes, {n_clusters} clusters, "
              f"union-find match={got == want}")

    if failures:
        print("\nDEDUP GATE FAILED:")
        for f in failures:
            print(" -", f)
        return 1
    print("\ndedup gate: all checks pass")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
