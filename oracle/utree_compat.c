/* Compat implementations of the tree-wrapping utilities that live in the
 * reference's bison grammar file (parse_utree.y) — bison is unavailable in
 * this image, so the generated parser is not built.  Only the structural
 * helpers needed by stepwise.c / utree.c are provided, with the semantics
 * documented at parse_utree.y:340-372 (fill order: tips in discovery
 * order, inner nodes in post-order) and :437-528 (wraptree).
 */
#include "pll.h"
#include <stdlib.h>

static void fill_nodes_rec(pll_unode_t * node, pll_unode_t ** array,
                           unsigned int * tip_index,
                           unsigned int * inner_index, int level)
{
  if (!node->next)
  {
    array[(*tip_index)++] = node;
    return;
  }
  pll_unode_t * snode = level ? node->next : node;
  do
  {
    fill_nodes_rec(snode->back, array, tip_index, inner_index, level + 1);
    snode = snode->next;
  }
  while (snode != node);
  array[(*inner_index)++] = node;
}

static void count_nodes_rec(pll_unode_t * node, unsigned int * tips,
                            unsigned int * inner, int level)
{
  if (!node->next)
  {
    (*tips)++;
    return;
  }
  pll_unode_t * snode = level ? node->next : node;
  do
  {
    count_nodes_rec(snode->back, tips, inner, level + 1);
    snode = snode->next;
  }
  while (snode != node);
  (*inner)++;
}

static pll_utree_t * wraptree_impl(pll_unode_t * root,
                                   unsigned int tip_count,
                                   unsigned int inner_count)
{
  if (!root->next) root = root->back;

  if (tip_count == 0 || inner_count == 0)
  {
    tip_count = inner_count = 0;
    count_nodes_rec(root, &tip_count, &inner_count, 0);
  }
  unsigned int node_count = tip_count + inner_count;

  pll_utree_t * tree = (pll_utree_t *)malloc(sizeof(pll_utree_t));
  tree->nodes = (pll_unode_t **)malloc(node_count * sizeof(pll_unode_t *));

  unsigned int tip_index = 0;
  unsigned int inner_index = tip_count;
  fill_nodes_rec(root, tree->nodes, &tip_index, &inner_index, 0);

  tree->tip_count = tip_count;
  tree->inner_count = inner_count;
  tree->edge_count = node_count - 1;
  tree->binary = (inner_count == tip_count - 2);
  tree->vroot = root;
  return tree;
}

PLL_EXPORT pll_utree_t * pll_utree_wraptree(pll_unode_t * root,
                                            unsigned int tip_count)
{
  return wraptree_impl(root, tip_count,
                       tip_count ? tip_count - 2 : 0);
}

PLL_EXPORT pll_utree_t * pll_utree_wraptree_multi(pll_unode_t * root,
                                                  unsigned int tip_count,
                                                  unsigned int inner_count)
{
  return wraptree_impl(root, tip_count, inner_count);
}

static void graph_destroy_rec(pll_unode_t * node,
                              void (*cb_destroy)(void *))
{
  if (!node) return;
  if (!node->next)
  {
    if (cb_destroy) cb_destroy(node->data);
    free(node->label);
    free(node);
    return;
  }
  pll_unode_t * snode = node->next;
  while (snode != node)
  {
    if (snode->back) graph_destroy_rec(snode->back, cb_destroy);
    pll_unode_t * next = snode->next;
    if (cb_destroy) cb_destroy(snode->data);
    free(snode->label);
    free(snode);
    snode = next;
  }
  if (cb_destroy) cb_destroy(node->data);
  free(node->label);
  free(node);
}

PLL_EXPORT void pll_utree_graph_destroy(pll_unode_t * root,
                                        void (*cb_destroy)(void *))
{
  if (!root) return;
  if (root->back) graph_destroy_rec(root->back, cb_destroy);
  graph_destroy_rec(root, cb_destroy);
}
