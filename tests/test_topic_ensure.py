"""IO7 ensure_topic: idempotent creation logic, brokerless.

The admin-client adapter is injected, so the ensure contract —
create-if-missing, no-op-if-present, concurrent-creator race treated as
success — is verified without a broker. The broker-gated counterpart in
test_kafka_smoke.py drives a real AdminClient.

Reference parity: orchestration/src/shared.py:50-65 (refresh_topic).
"""

from __future__ import annotations

import pytest

from big_data_flight_analytics_spark.sources.writers import ensure_topic


class FakeAdmin:
    def __init__(self, existing=(), create_raises=None):
        self.topics = set(existing)
        self.created = []
        self._raise = create_raises

    def topic_names(self):
        return set(self.topics)

    def create_topic(self, topic, num_partitions, replication_factor):
        if self._raise is not None:
            raise self._raise
        self.created.append((topic, num_partitions, replication_factor))
        self.topics.add(topic)


class TopicAlreadyExistsError(Exception):
    pass


class TestEnsureTopic:
    def test_creates_missing_topic_with_defaults(self):
        admin = FakeAdmin()
        assert ensure_topic("flights-data", admin=admin) is True
        # reference defaults: 3 partitions, replication 1 (shared.py:15-16)
        assert admin.created == [("flights-data", 3, 1)]

    def test_existing_topic_is_left_alone(self):
        admin = FakeAdmin(existing={"flights-data"})
        assert ensure_topic("flights-data", admin=admin) is False
        assert admin.created == []

    def test_custom_partitions_and_replication(self):
        admin = FakeAdmin()
        ensure_topic("hot", admin=admin, num_partitions=64, replication_factor=3)
        assert admin.created == [("hot", 64, 3)]

    def test_concurrent_creator_race_is_success(self):
        # another producer created the topic between list and create
        admin = FakeAdmin(create_raises=TopicAlreadyExistsError("boom"))
        assert ensure_topic("raced", admin=admin) is False

    def test_real_create_failure_propagates(self):
        admin = FakeAdmin(create_raises=RuntimeError("broker down"))
        with pytest.raises(RuntimeError, match="broker down"):
            ensure_topic("t", admin=admin)

    def test_idempotent_double_call(self):
        admin = FakeAdmin()
        assert ensure_topic("t", admin=admin) is True
        assert ensure_topic("t", admin=admin) is False
        assert len(admin.created) == 1

    def test_missing_client_lib_raises_clear_error(self):
        # sandbox has neither confluent-kafka nor kafka-python
        try:
            import confluent_kafka  # noqa: F401

            pytest.skip("confluent-kafka installed; default adapter works")
        except ImportError:
            pass
        try:
            import kafka  # noqa: F401

            pytest.skip("kafka-python installed; default adapter works")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="admin client"):
            ensure_topic("t", bootstrap_servers="localhost:9092")
