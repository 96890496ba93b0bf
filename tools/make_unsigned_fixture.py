#!/usr/bin/env python3
"""Generates src/test/resources/unsigned_types.parquet (uint8/16/32/64
boundary values) for TableApiSpec's ingestion-widening test. float16 is
deliberately absent: Spark 4.1 rejects FLOAT16 parquet
(PARQUET_TYPE_ILLEGAL), so half floats must be converted upstream."""
import pyarrow as pa
import pyarrow.parquet as pq

cols = {
    'id': pa.array(range(6), type=pa.int64()),
    'u8': pa.array([0, 1, 127, 128, 200, 255], type=pa.uint8()),
    'u16': pa.array([0, 1, 1000, 32768, 65000, 65535], type=pa.uint16()),
    'u32': pa.array([0, 1, 2**31, 3_000_000_000, 4_000_000_000, 2**32 - 1],
                    type=pa.uint32()),
    'u64': pa.array([0, 1, 2**63, 2**64 - 2, 12345, 2**64 - 1],
                    type=pa.uint64()),
}
pq.write_table(pa.table(cols), 'src/test/resources/unsigned_types.parquet')
print(pq.read_schema('src/test/resources/unsigned_types.parquet'))
