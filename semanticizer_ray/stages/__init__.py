"""Pipeline stages: each is a ``ray.data.Dataset -> Dataset`` transform.

The reference chains ``LinksProcessor`` plugins per request
(``semanticizer/procpipeline.py :: build``; SURVEY.md §2.1 extension
surface). Here the extension unit is a stage function/class over Datasets;
pipelines (``semanticizer_ray.pipelines``) compose them in order.
"""
