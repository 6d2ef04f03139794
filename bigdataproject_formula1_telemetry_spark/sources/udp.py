"""S13 — UDP datagram streaming source via the PySpark Python DataSource
API (public `pyspark.sql.datasource`, Spark 4).

The reference polls a non-blocking UDP socket at ~60 Hz on port 20777 and
parses datagrams in the same loop (F1-25_Telemetry_DB_Record.py:139-152).
Here ingestion is a proper Structured Streaming source emitting
``(arrival_ts, payload)`` rows — decoding stays a separate operator
(sources.telemetry.decode_packets), so the same decode/merge/throttle
graph runs on live UDP, on replayed logs, or in batch.

Two sources:
- ``UdpDataSource`` (format "udp"): binds a socket on the driver-side
  reader (SimpleDataSourceStreamReader), drains it per micro-batch.
  Suited to the single-socket recorder topology; for cluster-scale
  ingest, front the stream with Kafka instead (datagrams aren't
  replayable — the offset log stores drained packets in the commit).
- ``replay`` helper: turns a recorded packet log (parquet of
  arrival_ts/payload) into a rate-faithful file stream for tests and
  backfills.

Register with ``spark.dataSource.register(UdpDataSource)`` then
``spark.readStream.format("udp").option("port", 20777).load()``.
"""

from __future__ import annotations

import socket
import time

try:  # the Python DataSource API needs pyspark>=4
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    HAS_DATASOURCE_API = True
except Exception:  # pragma: no cover
    DataSource = object  # type: ignore[assignment]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment]
    HAS_DATASOURCE_API = False

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

UDP_SCHEMA = StructType(
    [
        StructField("arrival_ts", DoubleType()),
        StructField("payload", BinaryType()),
    ]
)


class UdpStreamReader(SimpleDataSourceStreamReader):
    """Drains whatever datagrams arrived since the last micro-batch.

    Offsets count packets; because UDP is not replayable, ``read`` returns
    the drained rows to be stored in the streaming commit log (the
    SimpleDataSourceStreamReader prefetch contract handles exactly this).
    """

    def __init__(self, options):
        self.port = int(options.get("port", 20777))
        self.host = options.get("host", "0.0.0.0")
        self.max_batch = int(options.get("maxpacketspertrigger", 6000))
        self.bufsize = int(options.get("bufsize", 4096))
        self._sock: socket.socket | None = None

    def _socket(self) -> socket.socket:
        if self._sock is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind((self.host, self.port))
            s.setblocking(False)
            self._sock = s
        return self._sock

    def initialOffset(self) -> dict:
        return {"packets": 0}

    def read(self, start: dict):
        sock = self._socket()
        rows = []
        for _ in range(self.max_batch):
            try:
                data, _addr = sock.recvfrom(self.bufsize)
            except BlockingIOError:
                break
            rows.append((time.time(), bytearray(data)))
        end = {"packets": start["packets"] + len(rows)}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # non-replayable source: rows between committed offsets were
        # persisted by the engine from read(); nothing to re-fetch.
        return iter([])


class UdpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "udp"

    def schema(self):
        return UDP_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: ARG002
        return UdpStreamReader(self.options)


def replay_stream(spark, log_dir: str, max_files_per_trigger: int = 1):
    """Recorded-log replay: stream a parquet packet log with the same
    (arrival_ts, payload) schema the UDP source emits."""
    from bigdataproject_formula1_telemetry_spark import schemas

    return (
        spark.readStream.schema(schemas.LIVE_PACKET_RAW)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(log_dir)
    )
