"""Round-11 contracts: multi-block SimHash banding.

The Manku et al. (WWW'07) C(b, k) block-combination banding is a pure
candidate-volume knob — guaranteed recall plus an exact bit_count(xor)
verify means the OUTPUT is identical to the shipped contiguous banding,
so this contract shares `simhash_join`'s oracle byte-for-byte: the gate
proves the widened posting-list keys change the plan, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from contracts.training_data import _docs_with_dups
from contracts.wave8 import _o_simhash_join


def q_simhash_join_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SimHash hamming join on MULTI-BLOCK banding
    (operators/dedup.simhash_hamming_join blocks=6, 32-bit, hamming<=3):
    C(6,3)=20 posting-list tables of 16-bit combination keys instead of
    4 tables of 8-bit band keys — bucket populations shrink
    exponentially with key width, the standard answer when banded
    buckets grow linear-in-corpus at billions of docs (Manku WWW'07
    §3). Output identical to `simhash_join` by construction."""
    from gordo_spark.operators.dedup import simhash_hamming_join

    return simhash_hamming_join(
        _docs_with_dups(spark, sf_dir), max_hamming=3, bits=32, blocks=6
    )


def o_simhash_join_blocks() -> str:
    return _o_simhash_join()
