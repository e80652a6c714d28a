"""
IDP aggregator: transparency-log ingestion for aggregator-mode deployments.

Monitors the tlog-tiles transparency logs of the active hubs of one network
and upserts their declaration entries into a single derived index
(idptest/idp). Pure Sans-IO cores (tlog, hublist, entry, plan_bundles) plus a
thin async poller shell — structure parity with the reference aggregator
(SURVEY §2.1, reference iscc_search/aggregator/).
"""

# Network-keyed knowledge shared by options (index name, allowed networks) and
# entry conversion (realm check).
NETWORKS = {
    "testnet": {"realm": 0, "index": "idptest"},
    "mainnet": {"realm": 1, "index": "idp"},
}
