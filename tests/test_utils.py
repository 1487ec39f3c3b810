"""SortedHashMap + LruCache tests (the reference's only unit-tested
component, src/sorted_hash.rs:112-249, plus our negative-cache LRU)."""

from point_cloud_tpu.utils.lru import LruCache
from point_cloud_tpu.utils.sorted_hash import SortedHashMap


class TestSortedHashMap:
    def test_insert_with_same_hash_key_overrides(self):
        """sorted_hash.rs:116-140."""
        m = SortedHashMap()
        m.insert("a", 5, "first")
        m.insert("a", 1, "second")
        assert len(m) == 1
        entry = m.pop_first()
        assert entry.value == "second"
        assert entry.sort_key == 1
        assert m.pop_first() is None

    def test_duplicate_sort_keys_allowed(self):
        """sorted_hash.rs:142-168."""
        m = SortedHashMap()
        m.insert("a", 7, 1)
        m.insert("b", 7, 2)
        assert len(m) == 2
        got = {m.pop_first().value, m.pop_first().value}
        assert got == {1, 2}

    def test_pop_first_sorted_order(self):
        """sorted_hash.rs:170-215."""
        m = SortedHashMap()
        for key, sort in [("x", 30), ("y", 10), ("z", 20)]:
            m.insert(key, sort, key)
        assert [m.pop_first().sort_key for _ in range(3)] == [10, 20, 30]
        assert m.is_empty()

    def test_remove_by_hash_key(self):
        """sorted_hash.rs:217-249."""
        m = SortedHashMap()
        m.insert("a", 1, "va")
        m.insert("b", 2, "vb")
        removed = m.remove("a")
        assert removed.value == "va"
        assert "a" not in m
        assert m.remove("a") is None
        assert m.pop_first().value == "vb"
        assert m.pop_first() is None

    def test_insertion_order_tie_break_is_fifo(self):
        m = SortedHashMap()
        for i in range(5):
            m.insert(f"k{i}", 0, i)
        assert [m.pop_first().value for _ in range(5)] == [0, 1, 2, 3, 4]

    def test_reinsert_after_pop(self):
        m = SortedHashMap()
        m.insert("a", 1, "v1")
        m.pop_first()
        m.insert("a", 2, "v2")
        assert m.pop_first().value == "v2"

    def test_clear(self):
        m = SortedHashMap()
        m.insert("a", 1, None)
        m.clear()
        assert m.is_empty()
        assert m.pop_first() is None


class TestLruCache:
    def test_eviction_order(self):
        c = LruCache(2)
        assert c.put("a", 1) is None
        assert c.put("b", 2) is None
        assert c.get("a") == 1  # refresh a
        evicted = c.put("c", 3)
        assert evicted == ("b", 2)
        assert "a" in c and "c" in c

    def test_remove_and_purge(self):
        c = LruCache(3)
        c.put("a", 1)
        assert c.remove("a") == 1
        assert c.remove("a") is None
        c.put("b", 2)
        c.purge()
        assert len(c) == 0


class TestEventBus:
    def test_send_drain_by_type(self):
        from dataclasses import dataclass

        from point_cloud_tpu.utils.events import EventBus

        @dataclass
        class Resized:
            w: int

        @dataclass
        class KeyDown:
            key: str

        bus = EventBus()
        bus.dispatch(Resized(10), KeyDown("w"), Resized(20))
        assert [e.w for e in bus.drain(Resized)] == [10, 20]
        assert bus.drain(Resized) == []  # drained
        assert bus.peek(KeyDown)[0].key == "w"
        assert [e.key for e in bus.drain(KeyDown)] == ["w"]
        bus.send(Resized(1))
        bus.clear()
        assert bus.drain(Resized) == []
