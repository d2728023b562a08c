"""MayFail monad laws + composition (reference monad.scala semantics)."""

from thundercats_spark.functional.maybe import Fail, IgnorableFail, MayFail, Ok, Pipe, pipeline


def test_ok_map():
    assert MayFail.of(lambda: 2).map(lambda x: x + 1) == Ok(3)


def test_fail_propagates():
    mf = MayFail.of(lambda: 1 / 0)
    assert mf.is_failing
    assert mf.map(lambda x: x + 1).is_failing
    assert mf.get_or_else(42) == 42
    assert "ZeroDivisionError" in mf.get_error()


def test_flat_map_chain():
    out = Ok(2).flat_map(lambda x: Ok(x * 10)).flat_map(lambda x: MayFail.of(lambda: x + 1))
    assert out == Ok(21)


def test_flat_map_short_circuits():
    calls = []

    def boom(_):
        calls.append(1)
        return Ok(0)

    out = MayFail.of(lambda: 1 / 0).flat_map(boom)
    assert out.is_failing and calls == []


def test_ignorable_fail_carries_data():
    mf = IgnorableFail(ValueError("x"), 5)
    assert mf.is_failing
    assert mf.get == 5
    assert mf.map(lambda v: v * 2).get == 10


def test_rshift_auto_lifts():
    out = Ok(1) >> (lambda x: x + 1) >> (lambda x: Ok(x * 3))
    assert out == Ok(6)


def test_pipe():
    assert (Pipe(2) >> (lambda x: x + 3) >> (lambda x: x * 2)).done == Ok(10)


def test_pipeline_stops_on_failure():
    seen = []
    out = pipeline(
        1,
        lambda x: x + 1,
        lambda x: 1 / 0,
        lambda x: seen.append(x) or x,
    )
    assert out.is_failing and seen == []


def test_monad_laws():
    f = lambda x: Ok(x + 1)  # noqa: E731
    g = lambda x: Ok(x * 2)  # noqa: E731
    # left identity
    assert Ok(3).flat_map(f) == f(3)
    # right identity
    assert Ok(3).flat_map(Ok) == Ok(3)
    # associativity
    assert Ok(3).flat_map(f).flat_map(g) == Ok(3).flat_map(lambda x: f(x).flat_map(g))
