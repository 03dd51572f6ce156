"""Structural output contract for every declared driver query.

The driver canonicalizes query results through a pandas value hash that
CRASHES on container cells (``TypeError: unhashable type: 'list'``).
This fired twice — r4 ``approx_sketches`` and r12 ``sketch_kmv_distinct``
— both times while the local oracle sweep showed green, because the old
``tools/check_correctness.py`` normalize silently tuple-ized list cells.
The convention is now structural (r12 verdict item 2):

* this test BUILDS every declared query's DataFrame and asserts no
  ArrayType / MapType / StructType anywhere in the result schema;
* ``tools/check_correctness.py`` hard-FAILs container columns and
  container cells (``ContainerCellError``), so the local gate can never
  again show 193-green where the driver reds.

Building (not collecting) is enough: the contract is on the declared
output schema, which Spark resolves at plan time. Queries whose builders
must execute work to produce a result (streaming drains, federated
servers) still only pay their build cost once here at sf0.001.
"""

import pytest

from dataweb_spark.queries import queries

_CONTAINER = ("array", "map", "struct")


def _container_fields(schema):
    return [f.name for f in schema.fields
            if f.dataType.typeName() in _CONTAINER]


@pytest.mark.parametrize("name", sorted(queries()))
def test_result_schema_is_scalar_only(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    bad = _container_fields(df.schema)
    assert not bad, (
        f"{name} declares container-typed result columns {bad}; the "
        f"driver's pandas canonicalizer cannot hash them — serialize to "
        f"scalars (concat_ws / array_to_string) on BOTH engines")


def test_check_correctness_gate_rejects_container_cells():
    """The local gate's normalize must RAISE on container cells, never
    canonicalize them — reverting that regresses the twice-fired class."""
    import importlib.util
    from pathlib import Path
    tool = (Path(__file__).resolve().parents[1] / "tools"
            / "check_correctness.py")
    spec = importlib.util.spec_from_file_location(
        "check_correctness", str(tool))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(mod.ContainerCellError):
        mod.normalize([(1, [2, 3])])
    with pytest.raises(mod.ContainerCellError):
        mod.normalize([({"a": 1},)])
    assert mod.normalize([(1, "x")]) == [(1, "x")]


def test_driver_window_is_exactly_full_and_declared():
    """The driver checks the FIRST 50 queries() entries: the window list
    must hold exactly 50 unique names, every one declared with an
    oracle, and must be the dict's actual prefix (the rotation's whole
    point is choosing WHICH 50 the driver sees)."""
    from dataweb_spark.queries import _DRIVER_WINDOW, oracle_sql
    qs = queries()
    oracles = oracle_sql()
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    assert list(qs)[:50] == _DRIVER_WINDOW
    missing = [n for n in _DRIVER_WINDOW if n not in oracles]
    assert not missing, f"windowed queries without oracles: {missing}"
