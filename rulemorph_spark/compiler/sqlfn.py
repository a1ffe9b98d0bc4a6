"""Session-registered SQL scalar functions (Spark 4 SQL UDFs).

``CREATE TEMPORARY FUNCTION … RETURN <expr>`` bodies are parsed
JVM-side in ONE round trip, the analyzer binds each ARGUMENT once via
an injected Project (true let-binding), and the optimizer inlines the
body into the executed plan — so a call site costs O(1) Python-side
Column constructions while executing exactly like the hand-built
expression tree.  For construction-heavy subtrees (the date-parse
chain builds ~3.5k py4j round trips per site) this cuts rule-compile
wall time ~10× per site (round 8; VERDICT r7 #1).

Restrictions (probed in tests/test_sqlfn.py):

- a call whose argument references a Catalyst lambda variable fails
  analysis — callers must gate on ``variant.lambda_depth() == 0`` and
  fall back to the inline Column builder;
- temporary functions are SESSION-scoped — the registry caches per
  (session id, body hash) and re-registers on new sessions.
"""

from __future__ import annotations

import hashlib
import threading
import weakref

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


class _State:
    """Per-SparkSession registry state.

    Keyed via WeakKeyDictionary on the session OBJECT, not ``id()``:
    CPython reuses ids after garbage collection, so an id-keyed cache
    could treat a brand-new session as already-registered (unresolved
    function at run time) or as disabled (silent slow path) —
    ADVICE r8 #1.  The weak key also drops the state when the session
    goes away instead of leaking one entry per session."""

    __slots__ = ("registered", "disabled", "probed", "deferred",
                 "pending", "__weakref__")

    def __init__(self) -> None:
        self.registered: set[str] = set()
        self.disabled = False
        self.probed = False
        # deferred-registration scope depth PER THREAD (see
        # ``deferred()``: only the thread inside a scope defers —
        # concurrent ensure_fn callers on other threads keep the
        # synchronous register-then-call contract) and the in-flight
        # CREATE futures, keyed by function name
        self.deferred: dict[int, int] = {}
        self.pending: dict = {}


_sessions: "weakref.WeakKeyDictionary[SparkSession, _State]" = \
    weakref.WeakKeyDictionary()
_lock = threading.Lock()


def _state(spark: SparkSession) -> _State:
    with _lock:
        st = _sessions.get(spark)
        if st is None:
            st = _State()
            _sessions[spark] = st
        return st


def disable(spark: SparkSession) -> None:
    """Force the inline Column path for this session (tests/diag)."""
    _state(spark).disabled = True


def enable(spark: SparkSession) -> None:
    st = _state(spark)
    st.disabled = False
    st.probed = False  # re-probe on next use


def registered_names(spark: SparkSession) -> set[str]:
    flush(spark)
    return set(_state(spark).registered)


_pool = None


def _executor():
    """Shared FIFO registration pool.  FIFO matters for deadlock
    freedom: a CREATE that waits on earlier-submitted helper CREATEs
    can only start after those were picked up (strict submission
    order), so a dependent never starves its own dependencies no
    matter the worker count."""
    global _pool
    if _pool is None:
        from concurrent.futures import ThreadPoolExecutor
        _pool = ThreadPoolExecutor(max_workers=8,
                                   thread_name_prefix="rm-sqlfn")
    return _pool


class deferred:
    """Batch-registration scope (r9, guide §5.2 ``the driver is part
    of the system``): inside the scope, ``ensure_fn`` SUBMITS each
    ``CREATE TEMPORARY FUNCTION`` to a background pool and returns the
    (hash-derived, known-without-running) name immediately, so the
    JVM analyzes function bodies concurrently with each other and with
    Python-side body construction — the t13 extended anchor's ~10 s of
    serial CREATEs collapse to the longest dependency chain.  A CREATE
    whose body references a still-pending function name waits for
    exactly those futures inside its task.

    ``flush()`` barriers run before ANY analysis that could resolve the
    functions (``Builder._flush``/``Builder.df`` — the only analysis
    points during rule compile) and on scope exit, so a failing CREATE
    still propagates loudly from ``compile()`` like the synchronous
    form (the round-8 ``silent slow path`` lesson).  Outside a scope,
    ``ensure_fn`` stays fully synchronous — direct callers and tests
    keep the register-then-call-immediately contract."""

    def __init__(self, spark: SparkSession | None):
        self._spark = spark

    def __enter__(self):
        if self._spark is not None:
            st = _state(self._spark)
            tid = threading.get_ident()
            with _lock:
                st.deferred[tid] = st.deferred.get(tid, 0) + 1
        return self

    def __exit__(self, *exc):
        if self._spark is not None:
            st = _state(self._spark)
            tid = threading.get_ident()
            with _lock:
                depth = st.deferred.get(tid, 0) - 1
                if depth > 0:
                    st.deferred[tid] = depth
                else:
                    st.deferred.pop(tid, None)
            # drain FULLY on both paths (each failed CREATE is popped,
            # so this terminates): a scope with several malformed
            # bodies must not leave failed futures behind to poison a
            # later, unrelated flush.  On the clean path the FIRST
            # failure re-raises after the drain; on the exception path
            # nothing is raised so the original exception propagates.
            first: Exception | None = None
            while True:
                try:
                    flush(self._spark)
                    break
                except Exception as e:
                    if first is None:
                        first = e
            if exc[0] is None and first is not None:
                raise first
        return False


def flush(spark: SparkSession | None = None) -> None:
    """Wait for all in-flight CREATEs of this session; re-raises the
    first failure (a malformed generated body is a compiler bug — it
    must never silently disable the fast path)."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        return
    st = _state(spark)
    while True:
        with _lock:
            items = list(st.pending.items())
        if not items:
            return
        for name, fut in items:
            try:
                fut.result()
            except Exception:
                # pop the failed CREATE so one bad body raises HERE
                # (loudly, like the synchronous form) without
                # poisoning every later flush of the session
                with _lock:
                    st.pending.pop(name, None)
                raise
            with _lock:
                st.registered.add(name)
                st.pending.pop(name, None)


def quote(s: str) -> str:
    """SQL single-quoted string literal (backslash-escaping parser)."""
    return "'" + (s.replace("\\", "\\\\").replace("'", "\\'")
                  .replace("\n", "\\n").replace("\r", "\\r")
                  .replace("\t", "\\t")) + "'"


def available() -> bool:
    spark = SparkSession.getActiveSession()
    return spark is not None and not _state(spark).disabled


def _probe(spark) -> bool:
    """Once per session: does this Spark support SQL UDFs at all?"""
    st = _state(spark)
    if st.probed:
        return not st.disabled
    try:
        spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION _rm_probe"
                  "(v STRING) RETURNS STRING RETURN v")
    except Exception:
        st.disabled = True
        return False
    finally:
        st.probed = True
    return True


def ensure_fn(params: str, returns: str, body: str, tag: str) -> str | None:
    """Register (idempotently) and return the function name; None when
    SQL UDFs are unavailable in this session.

    A failing CREATE of a specific body is a COMPILER BUG, not a
    missing feature — it propagates (a trivial probe function decides
    feature availability), so a malformed generated body can never
    silently disable the fast path (round-8 lesson: a bad float
    literal did exactly that and every test quietly took the inline
    path)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    st = _state(spark)
    if st.disabled:
        return None
    if not _probe(spark):
        return None
    key = hashlib.sha1(
        f"{params}|{returns}|{body}".encode()).hexdigest()[:16]
    name = f"_rm_{tag}_{key}"
    if name in st.registered:
        return name
    stmt = (f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
            f"({params}) RETURNS {returns} RETURN {body}")
    tid = threading.get_ident()
    with _lock:
        in_scope = st.deferred.get(tid, 0) > 0
        fut = st.pending.get(name)
        if fut is not None and in_scope:
            return name
    if fut is not None:
        # a deferring thread already submitted this CREATE; a
        # synchronous caller must be able to call it IMMEDIATELY, so
        # wait for that future here (failure pops + raises in flush's
        # style: loudly, without poisoning later flushes)
        try:
            fut.result()
        except Exception:
            with _lock:
                st.pending.pop(name, None)
            raise
        with _lock:
            st.registered.add(name)
            st.pending.pop(name, None)
        return name
    with _lock:
        if name in st.registered or (in_scope and name in st.pending):
            return name
        if in_scope:
            # deferred scope: submit and return the hash-derived name;
            # a body referencing a still-pending function waits for
            # exactly those futures (FIFO pool ⇒ deps already picked
            # up ⇒ no starvation).  flush() barriers sit before every
            # analysis point (Builder) and on scope exit.
            deps = [f for n, f in st.pending.items() if n in body]

            def _task(deps=deps, stmt=stmt):
                for f in deps:
                    f.result()
                spark.sql(stmt)

            st.pending[name] = _executor().submit(_task)
            return name
    spark.sql(stmt)
    st.registered.add(name)
    return name


def call(name: str, *args: Column) -> Column:
    return F.call_function(name, *args)
