"""User-extension surface (SURVEY.md §2.12): config, stage registry,
attribute-map extension."""

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_config_politeness_construction(ray_session):
    from dfg_gepris_crawler_ray.config import CrawlerConfig

    assert CrawlerConfig().make_politeness() is None  # bench mode: no actors
    gate = CrawlerConfig(min_delay_ms=10).make_politeness()
    assert gate is not None
    gate2 = CrawlerConfig(robots={"h": "User-agent: *\nDisallow: /x\n"}).make_politeness()
    assert gate2 is not None and gate2.has_robots
    assert CrawlerConfig(obey_robots=False, robots={"h": "x"}).make_politeness() is None


def test_stage_registry_composes_pipeline(ray_session):
    from dfg_gepris_crawler_ray.config import default_registry
    from dfg_gepris_crawler_ray.sources.pages import read_pages
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    reg = default_registry()
    assert reg.names() == ["annotate", "extract_search", "filter_details"]

    # user inserts a custom stage after the built-ins
    def drop_result_pages(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("kind"), "details"))

    reg.register("only_details", drop_result_pages)
    ds = read_pages(ensure_pages(SF))
    out = reg.build(ds, ["annotate", "filter_details", "only_details"]).to_pandas()
    assert set(out["kind"]) == {"details"}

    with pytest.raises(ValueError, match="already registered"):
        reg.register("annotate", drop_result_pages)


def test_attribute_map_extension():
    """Adding one dict entry accepts a new GEPRIS field — the
    reference's extension point (project_attributes.py:123-218)."""
    from dfg_gepris_crawler_ray.extract.errors import UnexpectedFieldError
    from dfg_gepris_crawler_ray.normalise import project
    from dfg_gepris_crawler_ray.normalise.attribute_maps import PROJEKT_ATTRIBUTES_MAP

    raw = {"Brandneues Feld": "wert", "DFG-Verfahren": "Sachbeihilfen"}
    with pytest.raises(UnexpectedFieldError):
        project.normalise(raw)
    PROJEKT_ATTRIBUTES_MAP["Brandneues Feld"] = "brandneues_feld"
    try:
        item = project.normalise(raw)
        assert item["brandneues_feld"] == ["wert"]
        assert item["dfg_verfahren"] == "Sachbeihilfen"
    finally:
        del PROJEKT_ATTRIBUTES_MAP["Brandneues Feld"]
