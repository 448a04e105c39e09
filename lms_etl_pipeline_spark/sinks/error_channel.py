"""Error-channel sink (reference S8: ``send_sns_notification`` — SNS publish
on any pipeline failure, ``/root/reference/src/lms_to_s3_lambda.py:177-189``
and ``s3_to_rds_lambda.py:88-100``).

Orthogonal to the query engine (SURVEY.md §2.1 S8): a try/except guard
around a job plus a pluggable publisher.  The publisher is injected so the
engine has no hard cloud dependency — production wires an SNS/webhook/
pager callable; tests wire a list-appender.  ``boto3`` is import-guarded:
this container doesn't ship it, and the engine must not require it.
"""

from __future__ import annotations

import logging
import traceback
from collections.abc import Callable
from contextlib import contextmanager

logger = logging.getLogger(__name__)

Publisher = Callable[[str, str], None]  # (subject, message) -> None


def log_publisher(subject: str, message: str) -> None:
    """Default publisher: structured log record (always available)."""
    logger.error("pipeline-error subject=%s message=%s", subject, message)


def sns_publisher(topic_arn: str) -> Publisher:
    """SNS-backed publisher, matching the reference's channel.  Requires
    boto3 at call time; raises ImportError with a clear message otherwise."""
    try:
        import boto3  # noqa: PLC0415 - optional dependency, resolved lazily
    except ImportError as exc:  # pragma: no cover - boto3 absent in CI image
        raise ImportError(
            "sns_publisher requires boto3; install it or use a custom Publisher"
        ) from exc
    client = boto3.client("sns")

    def publish(subject: str, message: str) -> None:
        client.publish(TopicArn=topic_arn, Subject=subject[:100], Message=message)

    return publish


@contextmanager
def pipeline_guard(job_name: str, publisher: Publisher = log_publisher):
    """Run a pipeline stage; on ANY exception publish to the error channel
    and re-raise (the job must still fail loudly — the reference returns a
    500 body, Spark jobs propagate the exception to the scheduler)."""
    try:
        yield
    except Exception as exc:
        publisher(
            f"pipeline failure: {job_name}",
            f"{type(exc).__name__}: {exc}\n{traceback.format_exc()}",
        )
        raise
