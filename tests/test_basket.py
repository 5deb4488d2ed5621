def test_cooccurrence_lift_goldens(spark):
    """M82: counts are basket-level (repeats inside a basket count once),
    lift is exactly n_ab*N/(n_a*n_b), min_pair prunes, nulls drop."""
    import pytest
    from engine.basket import cooccurrence_lift

    rows = [
        (1, "a"), (1, "a"), (1, "b"),          # repeat of 'a' counts once
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, None),                    # null item ignored
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {(r.item_a, r.item_b): r for r in
           cooccurrence_lift(df, "basket", "item").collect()}
    ab = out[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_ab, ab.n_baskets) == (3, 3, 2, 4)
    assert ab.support == 0.5 and ab.lift == 8 / 9
    assert ab.conf_a_to_b == 2 / 3 and ab.conf_b_to_a == 2 / 3
    ac = out[("a", "c")]
    assert (ac.n_ab, ac.lift) == (1, 4 / 3)
    assert ("b", "c") not in out                # never co-occur
    assert set(out) == {("a", "b"), ("a", "c")}
    pruned = cooccurrence_lift(df, "basket", "item", min_pair=2)
    assert [tuple(r[:2]) for r in pruned.select("item_a", "item_b").collect()] \
        == [("a", "b")]
    with pytest.raises(ValueError, match="min_pair"):
        cooccurrence_lift(df, "basket", "item", min_pair=0)
