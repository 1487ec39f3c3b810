"""StageTimer / stage() tracing tests (incl. worker-thread fallback)."""

import threading
import time

from point_cloud_tpu.utils.tracing import StageTimer, stage


class TestStageTimer:
    def test_accumulates_named_stages(self):
        with StageTimer() as t:
            with stage("a"):
                time.sleep(0.01)
            with stage("a"):
                pass
            with stage("b"):
                pass
        report = t.report()
        assert report["a"]["count"] == 2
        assert report["a"]["total_s"] >= 0.01
        assert report["b"]["count"] == 1
        assert "a" in t.summary() and "ms avg" in t.summary()

    def test_noop_without_active_timer(self):
        with stage("ignored"):
            pass  # must not raise

    def test_worker_threads_report_to_global_timer(self):
        def work():
            with stage("worker"):
                time.sleep(0.005)

        with StageTimer() as t:
            threads = [threading.Thread(target=work) for _ in range(4)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
        assert t.report()["worker"]["count"] == 4

    def test_throughput_summary(self):
        with StageTimer() as t:
            with stage("x"):
                time.sleep(0.01)
        assert "Mpts/s" in t.summary(points=1_000_000)

    def test_nested_timers_restore(self):
        outer = StageTimer()
        inner = StageTimer()
        with outer:
            with inner:
                with stage("deep"):
                    pass
            with stage("shallow"):
                pass
        assert "deep" in inner.report()
        assert "shallow" in outer.report()
        assert "deep" not in outer.report()
