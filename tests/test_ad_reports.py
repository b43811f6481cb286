"""Ad-report sync contract (`jitsu_spark/sources/ad_reports.py`) —
golden-tested against captured transport sequences, the CRM-destination
pattern. Reference: webapps/console/lib/server/syncs/mixpanel.ts."""

from __future__ import annotations

import datetime as dt

import pytest

from jitsu_spark.sources.ad_reports import (
    DictStore,
    FacebookCredentials,
    GoogleAdsCredentials,
    MixpanelDestination,
    days_to_sync,
    facebook_ads_sync,
    google_ads_sync,
    kv_adapter,
    mixpanel_auth_header,
    report_rows_df,
)

NOW = dt.datetime(2024, 3, 10, 12, 0, 0, tzinfo=dt.timezone.utc)
DEST = MixpanelDestination(
    project_id="p1",
    service_account_username="svc",
    service_account_password="pw",
)
FB = FacebookCredentials(
    client_id="c", account_ids=["42"], access_token="tok", client_secret="s"
)


class Capture:
    """Records every transport call; replies from a scripted queue keyed
    by URL prefix."""

    def __init__(self, pages=None):
        self.calls = []
        self.pages = list(pages or [])

    def __call__(self, url, method="GET", query=None, headers=None, body=None):
        self.calls.append(
            {"url": url, "method": method, "query": query,
             "headers": headers, "body": body}
        )
        if url.startswith("https://api.mixpanel.com/"):
            return {"status": "ok"}
        return self.pages.pop(0) if self.pages else {"data": []}



def _store_all_synced_except_lookback(now=NOW, lookback=2, total=30):
    """Every window day marked synced except the always-resync lookback
    pair — leaves exactly 2024-03-09/10 pending at NOW."""
    store = DictStore()
    for i in range(lookback, total):
        day = (now - dt.timedelta(days=i)).strftime("%Y-%m-%d")
        store.set(f"day-synced.{day}", {"t": 1})
    return store


class TestDayWindow:
    def test_lookback_always_syncs_even_when_marked(self):
        store = DictStore(
            {
                "day-synced.2024-03-10": {"t": 1},  # inside lookback
                "day-synced.2024-03-08": {"t": 1},  # outside -> skipped
            }
        )
        days = days_to_sync(store, now=NOW)
        assert days["2024-03-10"] is None  # re-syncs despite the record
        assert days["2024-03-09"] is None
        assert days["2024-03-08"] == {"t": 1}  # won't sync
        assert days["2024-03-07"] is None  # never synced -> will sync
        assert len(days) == 30 and list(days) == sorted(days)

    def test_window_sizes(self):
        days = days_to_sync(
            DictStore(), lookback_window=3, initial_sync_days=5, now=NOW
        )
        assert list(days) == [
            "2024-03-06", "2024-03-07", "2024-03-08",
            "2024-03-09", "2024-03-10",
        ]


class TestFacebookSync:
    def _page(self, campaign="camp1", nxt=None):
        page = {
            "data": [
                {
                    "campaign_id": campaign,
                    "campaign_name": f"{campaign}-name",
                    "adset_name": "as",
                    "ad_name": "ad",
                    "spend": "12.5",
                    "impressions": "100",
                    "clicks": "7",
                }
            ]
        }
        if nxt:
            page["paging"] = {"next": nxt}
        return page

    def test_request_shape_and_event_mapping(self):
        cap = Capture(pages=[self._page()] * 29)
        store = _store_all_synced_except_lookback()  # 03-09/10 pending
        res = facebook_ads_sync(FB, DEST, store, cap, now=NOW)
        assert res.days_synced == ["2024-03-09", "2024-03-10"]
        first = cap.calls[0]
        assert first["url"].endswith("/act_42/insights")
        q = first["query"]
        assert q["level"] == "ad" and q["limit"] == 1000
        assert '"since": "2024-03-09"' in q["time_range"].replace(
            '","', '", "'
        ) or "2024-03-09" in q["time_range"]
        assert "GREATER_THAN" in q["filtering"]
        assert "campaign_id" in q["fields"] and "adset_id" in q["fields"]
        # mixpanel import call follows each page with data
        mp = [c for c in cap.calls if "mixpanel.com" in c["url"]]
        assert len(mp) == 2 and mp[0]["method"] == "POST"
        assert mp[0]["url"].endswith("?project_id=p1")
        assert mp[0]["headers"]["Authorization"] == mixpanel_auth_header(DEST)
        ev = mp[0]["body"][0]
        p = ev["properties"]
        assert ev["event"] == "Ad Data"
        # JS Date.toISOString format — byte-identical to the reference's
        # ids so cross-implementation re-syncs stay idempotent
        assert p["$insert_id"] == "G-2024-03-09T00:00:00.000Z-camp1"
        assert p["time"] == int(
            dt.datetime(2024, 3, 9, tzinfo=dt.timezone.utc).timestamp() * 1000
        )
        assert (p["source"], p["utm_source"]) == ("facebook", "facebook")
        assert (p["cost"], p["impressions"], p["clicks"]) == (12.5, 100, 7)
        # per-day state written with the row count
        assert store.get("day-synced.2024-03-09")["totalDailyReportRows"] == 1

    def test_pagination_follows_next(self):
        nxt = "https://graph.facebook.com/v17.0/next-page-token"
        cap = Capture(pages=[self._page("c1", nxt=nxt), self._page("c2")])
        store = _store_all_synced_except_lookback()
        res = facebook_ads_sync(
            FB, DEST, store, cap, now=NOW, max_run_time_seconds=10**6
        )
        fb_calls = [c for c in cap.calls if "graph.facebook" in c["url"]]
        # lookback makes 03-09 and 03-10 pending; first day pages twice
        assert fb_calls[1]["url"] == nxt and fb_calls[1]["query"] is None
        ids = {e["properties"]["campaign_id"] for e in res.events}
        assert {"c1", "c2"} <= ids

    def test_time_budget_stops_before_day(self):
        ticks = iter([0.0, 0.0, 100.0])  # started, day1 check, day2 check
        cap = Capture(pages=[self._page()] * 5)
        store = DictStore()
        res = facebook_ads_sync(
            FB, DEST, store, cap, now=NOW,
            clock=lambda: next(ticks), max_run_time_seconds=60,
        )
        assert res.stopped_early
        assert len(res.days_synced) == 1  # second day deferred

    def test_empty_accounts_rejected_and_multi_warns(self):
        with pytest.raises(ValueError, match="No account ids"):
            facebook_ads_sync(
                FacebookCredentials("c", [], "t", "s"),
                DEST, DictStore(), Capture(), now=NOW,
            )
        cap = Capture(pages=[{"data": []}] * 30)
        res = facebook_ads_sync(
            FacebookCredentials("c", ["1", "2"], "t", "s"),
            DEST, DictStore(), cap, now=NOW,
        )
        assert any("Using the first one: 1" in line for line in res.log)
        assert all("act_1/" in c["url"] for c in cap.calls
                   if "graph.facebook" in c["url"])


GOOG = GoogleAdsCredentials(
    client_id="c", access_token="a", client_secret="s",
    refresh_token="r", developer_token="d", customer_id="777",
)


def _campaign_row(day, cid=9, cost_micros=2_500_000):
    return {
        "segments": {"date": day},
        "campaign": {"id": cid, "name": f"camp-{cid}"},
        "metrics": {
            "cost_micros": cost_micros, "impressions": 10, "clicks": 3
        },
    }


class TestGoogleSync:
    def test_event_mapping_and_state(self):
        queries = []

        def gaql(customer_id, login_customer_id, query):
            queries.append((customer_id, login_customer_id, query))
            if "FROM customer WHERE" in query:
                return [{"customer": {"manager": False}}]
            if "FROM campaign" in query:
                day = query.split("BETWEEN '")[1][:10]
                if day == "2024-03-10":
                    return [_campaign_row(day)]
            return []

        cap = Capture()
        store = _store_all_synced_except_lookback()
        res = google_ads_sync(GOOG, DEST, store, cap, gaql, now=NOW)
        assert res.days_synced == ["2024-03-09", "2024-03-10"]
        p = res.events[0]["properties"]
        assert p["$insert_id"] == "G-2024-03-10-9"
        assert p["source"] == "Google" and p["utm_source"] == "google"
        assert p["cost"] == 2.5  # cost_micros / 1e6
        # one mixpanel POST for the non-empty day
        mp = [c for c in cap.calls if "mixpanel.com" in c["url"]]
        assert len(mp) == 1 and mp[0]["body"][0]["properties"]["cost"] == 2.5
        # campaign queries filter cost and pin the day range
        camp_q = [q for _, _, q in queries if "FROM campaign" in q]
        assert all("metrics.cost_micros > 0" in q for q in camp_q)

    def test_manager_account_expands_to_sub_accounts(self):
        calls = []

        def gaql(customer_id, login_customer_id, query):
            calls.append((customer_id, login_customer_id))
            if "FROM customer WHERE" in query:
                return [{"customer": {"manager": True}}]
            if "FROM customer_client" in query:
                return [
                    {"customer_client": {"id": 111}},
                    {"customer_client": {"id": 222}},
                ]
            return []

        store = _store_all_synced_except_lookback()
        res = google_ads_sync(GOOG, DEST, store, Capture(), gaql, now=NOW)
        assert any("manager account with 2 sub-accounts" in line
                   for line in res.log)
        # per-day campaign queries run per sub-account with the manager
        # as login customer
        campaign_calls = calls[2:]
        assert ("111", "777") in campaign_calls
        assert ("222", "777") in campaign_calls

    def test_multi_customer_list_skips_manager_check(self):
        seen = []

        def gaql(customer_id, login_customer_id, query):
            seen.append(query)
            return []

        creds = GoogleAdsCredentials(
            client_id="c", access_token="a", client_secret="s",
            refresh_token="r", developer_token="d", customer_id="1,2",
        )
        google_ads_sync(creds, DEST, DictStore(), Capture(), gaql, now=NOW)
        assert not any("FROM customer WHERE" in q for q in seen)

    def test_budget_checked_after_day(self):
        ticks = iter([0.0] + [100.0] * 50)

        def gaql(*a):
            return []

        res = google_ads_sync(
            GOOG, DEST, DictStore(), Capture(),
            lambda cid, lcid, q: [{"customer": {"manager": False}}]
            if "FROM customer WHERE" in q else [],
            now=NOW, clock=lambda: next(ticks), max_run_time_seconds=60,
        )
        # Google checks AFTER the first day completes (mixpanel.ts:379)
        assert res.stopped_early and len(res.days_synced) == 1


class TestWarehouseLanding:
    def test_report_rows_df_shape(self, spark):
        store = _store_all_synced_except_lookback()
        cap = Capture(
            pages=[
                {
                    "data": [
                        {
                            "campaign_id": "c9", "campaign_name": "n",
                            "adset_name": "as", "ad_name": "ad",
                            "spend": "1.0", "impressions": "2", "clicks": "3",
                        }
                    ]
                }
            ] * 2
        )
        res = facebook_ads_sync(FB, DEST, store, cap, now=NOW)
        df = report_rows_df(spark, res.events)
        rows = df.collect()
        assert len(rows) == len(res.events) > 0
        assert dict(df.dtypes) == {
            "time": "timestamp", "source": "string",
            "campaign_id": "string", "utm_source": "string",
            "utm_campaign": "string", "cost": "double",
            "impressions": "bigint", "clicks": "bigint",
        }

    def test_kv_adapter_persists_through_syncstate(self, tmp_path):
        from jitsu_spark.sources.sync import SyncState

        state = SyncState(str(tmp_path))
        kv = kv_adapter(state, "ads1")
        assert kv.get("day-synced.2024-03-01") is None
        kv.set("day-synced.2024-03-01", {"n": 5})
        # a fresh adapter over the same file sees the write
        kv2 = kv_adapter(SyncState(str(tmp_path)), "ads1")
        assert kv2.get("day-synced.2024-03-01") == {"n": 5}
        # and the sync's own cursor state is untouched
        assert state.get_cursor("ads1") is None


class TestHonoredCredentialKnobs:
    def test_insights_lookback_window_and_page_size(self):
        """The reference DECLARES these knobs but hardcodes 2/1000; we
        honor them (defaults reproduce the reference exactly)."""
        cap = Capture(pages=[{"data": []}] * 40)
        creds = FacebookCredentials(
            client_id="c", account_ids=["1"], access_token="t",
            client_secret="s", page_size=250, insights_lookback_window=5,
        )
        store = DictStore(
            {
                f"day-synced.{(NOW - dt.timedelta(days=i)).strftime('%Y-%m-%d')}":
                {"t": 1}
                for i in range(0, 30)
            }
        )
        res = facebook_ads_sync(creds, DEST, store, cap, now=NOW)
        # 5 lookback days re-sync despite all being marked
        assert len(res.days_synced) == 5
        fb = [c for c in cap.calls if "graph.facebook" in c["url"]]
        assert all(c["query"]["limit"] == 250 for c in fb)
