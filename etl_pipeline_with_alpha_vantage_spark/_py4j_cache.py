"""Reflection-result caching for py4j — driver-overhead optimization.

Every PySpark Column/functions API call crosses the JVM boundary through
py4j, and py4j resolves names by REFLECTION ROUND TRIPS with no cache:

* ``JVMView.__getattr__``  (``jvm.org.apache.spark.sql.functions``) — one
  RPC per access, returns a ``JavaClass``/``JavaPackage``;
* ``JavaClass.__getattr__`` (``functions.col``) — one RPC per access,
  returns a ``JavaMember`` for a static method;
* ``JavaPackage.__getattr__`` — one RPC per package-path segment.

So a single ``F.col("x")`` costs THREE round trips (measured on this
engine: 2 reflection + 1 invocation, ~0.5-1 ms each), and a warm
213-query DataFrame-construction pass spends ~80k RPCs, most of them
re-resolving the same two dozen names (guide §5: the driver should do
almost no busywork). Installing this cache cuts ``F.*`` to exactly the
one invocation RPC.

What is cached — only reflection results that are STABLE for the life of
a JVM view:

* classes and packages (a classloader never re-binds a name);
* static METHODS (``JavaMember``) and nested classes.

Static FIELD reads (``JavaClass.__getattr__`` can return a field VALUE)
are deliberately NOT cached — a field may mutate between reads.

Lifetime: entries are written into the instance ``__dict__`` of the
``JVMView`` / ``JavaClass`` / ``JavaPackage`` being accessed (so Python
never calls ``__getattr__`` for that name again — zero overhead on
hits). A new SparkContext builds a new ``JVMView``, so caches die with
the gateway that produced them; nothing is keyed globally.

Failed resolutions raise exactly as before and are never cached.
"""

from __future__ import annotations

_installed = False


def install() -> None:
    """Idempotently install the reflection caches. Safe to call before
    any SparkSession exists; a no-op when py4j is absent (Spark Connect
    client-only environments)."""
    global _installed
    if _installed:
        return
    try:
        from py4j.java_gateway import (
            JavaClass,
            JavaMember,
            JavaPackage,
            JVMView,
        )
    except ImportError:  # pragma: no cover - connect-only install
        return

    orig_view = JVMView.__getattr__
    orig_class = JavaClass.__getattr__
    orig_package = JavaPackage.__getattr__

    def view_getattr(self, name):
        result = orig_view(self, name)
        if isinstance(result, (JavaClass, JavaPackage)):
            self.__dict__[name] = result
        return result

    def class_getattr(self, name):
        result = orig_class(self, name)
        # JavaMember = static method (stable); JavaClass = nested class
        # (stable). Anything else is a static field VALUE — never cache.
        if isinstance(result, (JavaMember, JavaClass)):
            self.__dict__[name] = result
        return result

    def package_getattr(self, name):
        result = orig_package(self, name)
        if isinstance(result, (JavaClass, JavaPackage)):
            self.__dict__[name] = result
        return result

    JVMView.__getattr__ = view_getattr
    JavaClass.__getattr__ = class_getattr
    JavaPackage.__getattr__ = package_getattr
    _installed = True
