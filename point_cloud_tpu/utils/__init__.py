"""Host-side control-plane utilities: priority queues, caches, thread pool."""

from .lru import LruCache  # noqa: F401
from .sorted_hash import SortedHashMap  # noqa: F401
