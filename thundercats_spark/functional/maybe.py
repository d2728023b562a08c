"""MayFail — error-carrying result monad.

Re-expression of the reference's ``MayFail[A]`` trait with
``Ok / Fail / IgnorableFail`` cases (reference:
thundercats/src/main/scala/com/tao/thundercats/functional/monad.scala:19-72).
Python has no for-comprehension, so composition is ``flat_map`` chains,
the ``>>`` operator (reference Util.scala:31 ``DataFrameOps.>>``), or the
``pipeline(seed, *steps)`` helper which plays the role of the Scala
for-block: it stops at the first failure and carries the error out.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable
from typing import Any, Generic, TypeVar

A = TypeVar("A")
B = TypeVar("B")


class MayFail(Generic[A]):
    """Base: wrap a computation so errors become values, not raises."""

    @staticmethod
    def of(thunk: Callable[[], A]) -> "MayFail[A]":
        """Run ``thunk``; Ok on success, Fail (with traceback) on raise."""
        try:
            return Ok(thunk())
        except Exception as e:  # noqa: BLE001 — mirror of scala Try
            return Fail(e)

    @staticmethod
    def attempt(f: Callable[..., A], *args: Any, **kwargs: Any) -> "MayFail[A]":
        return MayFail.of(lambda: f(*args, **kwargs))

    # -- interface ---------------------------------------------------------
    def map(self, f: Callable[[A], B]) -> "MayFail[B]":
        raise NotImplementedError

    def flat_map(self, g: Callable[[A], "MayFail[B]"]) -> "MayFail[B]":
        raise NotImplementedError

    def map_opt(self, g: Callable[[A], B]) -> B | None:
        raise NotImplementedError

    @property
    def get(self) -> A:
        raise NotImplementedError

    def get_or_else(self, a: A) -> A:
        raise NotImplementedError

    def get_error(self) -> str | None:
        raise NotImplementedError

    @property
    def is_failing(self) -> bool:
        raise NotImplementedError

    # ``mf >> f`` where f: A -> B | MayFail[B]. Auto-lifts plain results so
    # both transformations and monadic ops chain uniformly.
    def __rshift__(self, f: Callable[[A], Any]) -> "MayFail[Any]":
        return self.flat_map(lambda a: _lift(lambda: f(a)))


def _lift(thunk: Callable[[], Any]) -> MayFail[Any]:
    try:
        out = thunk()
    except Exception as e:  # noqa: BLE001
        return Fail(e)
    return out if isinstance(out, MayFail) else Ok(out)


class Ok(MayFail[A]):
    __slots__ = ("data",)

    def __init__(self, data: A):
        self.data = data

    def map(self, f):
        return MayFail.of(lambda: f(self.data))

    def flat_map(self, g):
        try:
            return g(self.data)
        except Exception as e:  # noqa: BLE001
            return Fail(e)

    def map_opt(self, g):
        return g(self.data)

    @property
    def get(self):
        return self.data

    def get_or_else(self, a):
        return self.data

    def get_error(self):
        return None

    @property
    def is_failing(self):
        return False

    def __repr__(self):
        return f"Ok({self.data!r})"

    def __eq__(self, other):
        return isinstance(other, Ok) and other.data == self.data

    def __hash__(self):
        return hash(("Ok", self.data))


class Fail(MayFail[A]):
    __slots__ = ("error",)

    def __init__(self, error: BaseException):
        self.error = error

    def map(self, f):
        return Fail(self.error)

    def flat_map(self, g):
        return Fail(self.error)

    def map_opt(self, g):
        return None

    @property
    def get(self):
        raise LookupError("No value resolved") from self.error

    def get_or_else(self, a):
        return a

    def get_error(self):
        return "".join(
            traceback.format_exception(type(self.error), self.error, self.error.__traceback__)
        )

    @property
    def is_failing(self):
        return True

    def __repr__(self):
        return f"Fail({self.error!r})"


class IgnorableFail(MayFail[A]):
    """Failure that still carries usable data (reference monad.scala:51)."""

    __slots__ = ("error", "data")

    def __init__(self, error: BaseException, data: A):
        self.error = error
        self.data = data

    def map(self, f):
        return IgnorableFail(self.error, f(self.data))

    def flat_map(self, g):
        try:
            return g(self.data)
        except Exception as e:  # noqa: BLE001
            return Fail(e)

    def map_opt(self, g):
        return g(self.data)

    @property
    def get(self):
        return self.data

    def get_or_else(self, a):
        return a

    def get_error(self):
        return "".join(
            traceback.format_exception(type(self.error), self.error, self.error.__traceback__)
        )

    @property
    def is_failing(self):
        return True

    def __repr__(self):
        return f"IgnorableFail({self.error!r}, {self.data!r})"


class Pipe(Generic[A]):
    """``Pipe(df) >> f >> g`` — the reference's DataFrame bind operator
    (Util.scala:31) for plain values; unwrap with ``.done`` (a MayFail)."""

    def __init__(self, value: A):
        self._mf: MayFail[A] = Ok(value)

    def __rshift__(self, f: Callable[[A], Any]) -> "Pipe[Any]":
        out = Pipe.__new__(Pipe)
        out._mf = self._mf >> f
        return out

    @property
    def done(self) -> MayFail[A]:
        return self._mf


def pipeline(seed: Any, *steps: Callable[[Any], Any]) -> MayFail[Any]:
    """Do-notation stand-in: thread ``seed`` through ``steps``, stopping
    at the first failure. Steps may return plain values or MayFail."""
    mf = seed if isinstance(seed, MayFail) else _lift(lambda: seed() if callable(seed) else seed)
    for step in steps:
        mf = mf >> step
    return mf
