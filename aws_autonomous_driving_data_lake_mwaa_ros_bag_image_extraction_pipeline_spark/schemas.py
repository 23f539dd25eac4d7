"""Declared schema registry (SURVEY §1).

The reference infers schemas dynamically (first message of each topic defines
the CSV header, `bag_to_csv.py:114-136`; pandas re-infers types,
`engine.py:186`). We declare them instead — same capability, order-independent
and strongly typed — with inference retained as a fallback in the sources.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- topic whitelist (engine.py:200-209) -----------------------------------
TOPIC_WHITELIST = [
    "/gps",
    "/gps_time",
    "/imu",
    "/pose_ground_truth",
    "/pose_localized",
    "/pose_raw",
    "/tf",
    "/velocity_raw",
]

# Long-format bag dump: one row per ROS message (SURVEY §1.2).
TOPIC_MESSAGES_SCHEMA = StructType(
    [
        StructField("bag_id", StringType()),
        StructField("topic", StringType()),
        StructField("rosbagTimestamp", LongType()),  # ns epoch
        StructField("seq", IntegerType()),
        StructField("payload", MapType(StringType(), StringType())),
    ]
)

# Per-topic typed field registry: payload keys -> Spark type. The reference's
# flatten emits `name: value` string pairs (bag_to_csv.py:114-136); these are
# the declared typed equivalents used by the pivot/flatten operator.
TOPIC_FIELDS: dict[str, dict[str, str]] = {
    "/imu": {
        **{f"orientation.{a}": "double" for a in "xyzw"},
        **{f"angular_velocity.{a}": "double" for a in "xyz"},
        **{f"linear_acceleration.{a}": "double" for a in "xyz"},
        **{f"orientation_covariance.{i}": "double" for i in range(9)},
    },
    "/gps": {
        "latitude": "double",
        "longitude": "double",
        "altitude": "double",
        "status.status": "int",
        "status.service": "int",
    },
    "/gps_time": {"time_ref.secs": "bigint", "time_ref.nsecs": "bigint"},
    "/pose_ground_truth": {
        **{f"pose.position.{a}": "double" for a in "xyz"},
        **{f"pose.orientation.{a}": "double" for a in "xyzw"},
    },
    "/pose_localized": {
        **{f"pose.position.{a}": "double" for a in "xyz"},
        **{f"pose.orientation.{a}": "double" for a in "xyzw"},
    },
    "/pose_raw": {
        **{f"pose.position.{a}": "double" for a in "xyz"},
        **{f"pose.orientation.{a}": "double" for a in "xyzw"},
    },
    "/velocity_raw": {
        **{f"twist.linear.{a}": "double" for a in "xyz"},
        **{f"twist.angular.{a}": "double" for a in "xyz"},
    },
    "/tf": {
        "child_frame_id": "string",
        **{f"transform.translation.{a}": "double" for a in "xyz"},
        **{f"transform.rotation.{a}": "double" for a in "xyzw"},
    },
}

# Extracted camera frames — the multimodal-column table (SURVEY §1.3).
FRAMES_SCHEMA = StructType(
    [
        StructField("bag_id", StringType()),
        StructField("camera", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("filename", StringType()),
        StructField("frame_time", TimestampType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

# Rekognition detect_labels output (SURVEY §1.4; outputs/right0033.json).
BOUNDING_BOX_SCHEMA = StructType(
    [
        StructField("Width", DoubleType()),
        StructField("Height", DoubleType()),
        StructField("Left", DoubleType()),
        StructField("Top", DoubleType()),
    ]
)
INSTANCE_SCHEMA = StructType(
    [
        StructField("BoundingBox", BOUNDING_BOX_SCHEMA),
        StructField("Confidence", DoubleType()),
    ]
)
LABEL_SCHEMA = StructType(
    [
        StructField("Name", StringType()),
        StructField("Confidence", DoubleType()),
        StructField("Instances", ArrayType(INSTANCE_SCHEMA)),
        StructField(
            "Parents",
            ArrayType(StructType([StructField("Name", StringType())])),
        ),
    ]
)
LABELS_ARRAY_SCHEMA = ArrayType(LABEL_SCHEMA)

LABELS_TABLE_SCHEMA = StructType(
    [
        StructField("bag_id", StringType()),
        StructField("camera", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("labels", LABELS_ARRAY_SCHEMA),
    ]
)

# Discovery/state ledger (SURVEY §1.6 — S3 keys + processing.status tags).
BAG_MANIFEST_SCHEMA = StructType(
    [
        StructField("bag_id", StringType()),
        StructField("bucket", StringType()),
        StructField("key", StringType()),
        StructField("size_bytes", LongType()),
        StructField("status", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)

# processing.status values (processing.py:4-7)
STATUS_IN_PROGRESS = "in progress"
STATUS_COMPLETE = "complete"
STATUS_FAILURE = "failure"
TERMINAL_OR_ACTIVE = [STATUS_IN_PROGRESS, STATUS_COMPLETE, STATUS_FAILURE]
