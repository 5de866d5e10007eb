"""Name normalization parity cases (ref schema/normalize.go:9-82).

The reference uses ettle/strcase ToSnake with a custom splitter; these cases
pin the observable behavior our engine must match.
"""

import pytest

from substreams_sink_graph_load_spark.schema import normalize_field


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("BlockMeta", "block_meta"),
        ("blockMeta", "block_meta"),
        ("txCount", "tx_count"),
        ("fromAccount", "from_account"),
        ("id", "id"),
        ("ID", "id"),
        ("Pool2Token", "pool_2_token"),
        ("pool2token", "pool_2_token"),
        ("token0", "token_0"),         # digit run splits from preceding lower-case
        ("ABCDef", "abc_def"),
        ("entityID", "entity_id"),
        ("URLValue", "url_value"),
        ("value", "value"),
        ("Value", "value"),
        ("my.field", "my_field"),
        ("a,b", "a_b"),
        ("1.5x", "1.5_x"),
        ("with space", "with_space"),
        ("snake_case_already", "snake_case_already"),
    ],
)
def test_normalize(raw, expected):
    assert normalize_field(raw) == expected


def test_uniswap_style_names():
    """Field names from the reference's own demo workload (uniswap-v3),
    verified by hand against normalize.go's split actions — including the
    upper-before-number suppression (X96) and the number-squeeze rule
    (0X128 stays joined because X sits between digits)."""
    cases = {
        "sqrtPriceX96": "sqrt_price_x96",
        "sqrtPriceX96abc": "sqrt_price_x96_abc",
        "token0Price": "token_0_price",
        "volumeUSD": "volume_usd",
        "amount0": "amount_0",
        "TVLUSDUntracked": "tvlusd_untracked",
        "feeGrowthGlobal0X128": "fee_growth_global_0x128",
        "liquidityProviderCount": "liquidity_provider_count",
    }
    for raw, want in cases.items():
        assert normalize_field(raw) == want, raw
