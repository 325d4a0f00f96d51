"""Synthetic diploid genome + noisy long-read simulator.

Counterpart of the reference's dev harness (``sandbox/src/bin/gen_sim_genome*.rs``
and the NanoSim scripts, SURVEY.md §2.6): generates a random genome, a diverged
second haplotype (SNVs + small indels + optional SVs), and noisy reads with
ONT-like error profiles — used by tests and benchmarks throughout.
"""

from __future__ import annotations

import numpy as np

from ..datamodel import DataSet, RawRead, ReadType
from .. import seq as seqmod


def random_genome(rng: np.random.Generator, length: int) -> np.ndarray:
    return rng.integers(0, 4, size=length).astype(np.int8)


def mutate(rng: np.random.Generator, seq: np.ndarray, sub: float = 0.0,
           ins: float = 0.0, dele: float = 0.0) -> np.ndarray:
    """Apply random substitutions/insertions/deletions at the given rates."""
    out = []
    for b in seq:
        x = rng.random()
        if x < dele:
            continue
        if x < dele + sub:
            out.append((b + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(b)
        if rng.random() < ins:
            out.append(rng.integers(0, 4))
    return np.array(out, dtype=np.int8)


def diploid(rng: np.random.Generator, length: int, het: float = 0.001):
    """Two haplotypes diverged by ``het`` (2/3 SNV, 1/6 ins, 1/6 del)."""
    hap1 = random_genome(rng, length)
    hap2 = mutate(rng, hap1, sub=het * 2 / 3, ins=het / 6, dele=het / 6)
    return hap1, hap2


def noisy_read(rng: np.random.Generator, template: np.ndarray, error: float):
    """ONT-ish error mix: 1/3 sub, 1/3 ins, 1/3 del of total ``error``."""
    return mutate(rng, template, sub=error / 3, ins=error / 3, dele=error / 3)


def simulate_reads(rng: np.random.Generator, haplotypes, coverage: float,
                   mean_len: int, error: float, min_len: int = 500):
    """Sample reads uniformly over the haplotypes; ~half reverse strand.

    Returns list of dicts: codes, hap (index), start, end, is_forward.
    """
    reads = []
    total = sum(len(h) for h in haplotypes)
    n_reads = int(coverage * total / mean_len / len(haplotypes) * len(haplotypes))
    n_reads = max(int(coverage * total / mean_len), 1)
    for _ in range(n_reads):
        h = int(rng.integers(0, len(haplotypes)))
        hap = haplotypes[h]
        ln = int(np.clip(rng.normal(mean_len, mean_len / 4), min_len, len(hap)))
        start = int(rng.integers(0, max(len(hap) - ln, 1)))
        frag = hap[start:start + ln]
        codes = noisy_read(rng, frag, error)
        fwd = bool(rng.random() < 0.5)
        if not fwd:
            codes = seqmod.revcomp(codes)
        reads.append({"codes": codes, "hap": h, "start": start,
                      "end": start + ln, "is_forward": fwd})
    return reads


def reads_to_dataset(reads, read_type: str = ReadType.ONT,
                     input_file: str = "sim.fa") -> DataSet:
    raws = []
    for i, r in enumerate(reads):
        raws.append(RawRead(f"sim_{i}", "", i,
                            seqmod.decode(r["codes"]).decode()))
    return DataSet.with_minimum_data(input_file, raws, read_type)
