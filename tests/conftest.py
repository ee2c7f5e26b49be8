import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Route every test temp file (tmp_path fixtures and tempfile.*) to tmpfs
# when available: streaming tests fsync state/offset/commit logs per
# micro-batch into tmp_path, and this box's /tmp disk has a pathological
# small-sync path (the bench's io probe swings 0.7x-20x of its pinned
# reference; measured here: identical one-row micro-batches trigger in
# ~650-890 ms on tmpfs vs ~1000-1470 ms on /tmp). Checkpoint/state files
# are throwaway test artifacts — tmpfs is the right home for them, same
# reasoning as get_spark's spark.local.dir default. A pre-set TMPDIR
# (user/driver override) is respected.
if os.path.isdir("/dev/shm") and "TMPDIR" not in os.environ:
    _SHM_TMP = "/dev/shm/kspark_pytest_tmp"
    os.makedirs(_SHM_TMP, exist_ok=True)
    os.environ["TMPDIR"] = _SHM_TMP
    tempfile.tempdir = _SHM_TMP

from kapacitor_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Partition count for the test session: fixtures are tiny (dozens to
    # thousands of rows), and every stateful streaming micro-batch pays a
    # per-state-partition commit (delta file + fsync + rename) plus, for
    # Python keyed machines, an Arrow worker round-trip — measured
    # ~17 ms/partition/batch. Results are partition-count independent
    # (keyed state, associative merges — asserted by
    # test_run_available_now_state_partitions), so the suite default
    # favors wall clock; override to re-run wider.
    parts = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "2"))
    s = get_spark("kapacitor-spark-tests", shuffle_partitions=parts)

    # Fixture-data layout fix for the whole suite: createDataFrame(list)
    # slices local rows across defaultParallelism (local[32]: 32 slices,
    # almost all EMPTY for the suite's tiny fixtures), and every action
    # on such a frame then pays one Python-worker round trip per slice —
    # measured ~0.17 s each on this box (0.4 s per action in parallel;
    # 5.5 s when a coalesce(1) evaluates them sequentially, the
    # _write_batches pattern). Re-slice list data to ~512 rows/slice so a
    # 4-row fixture is ONE slice. Values, schemas, and every library code
    # path are unchanged — this only sets the partition count of test
    # fixture data, exactly like writing parallelize(rows, 1) at each of
    # the ~400 call sites.
    _orig_create = s.createDataFrame

    def _create_small(data, schema=None, **kw):
        if isinstance(data, list) and data and schema is not None and not kw:
            n = min(1 + len(data) // 512, s.sparkContext.defaultParallelism)
            try:
                return _orig_create(s.sparkContext.parallelize(data, n), schema)
            except Exception:
                return _orig_create(data, schema)
        if schema is not None:
            return _orig_create(data, schema, **kw)
        return _orig_create(data, **kw)

    s.createDataFrame = _create_small
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")
